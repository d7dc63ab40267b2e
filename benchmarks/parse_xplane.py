"""Parse a jax.profiler xplane.pb into a per-op device-time table.

Aggregates XLA-op event durations on the TPU device plane, grouped by a
coarse category derived from the op name. Usage:
    python benchmarks/parse_xplane.py /tmp/jaxtrace [-n 40]
"""
import argparse
import collections
import glob
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def load(path_or_dir):
    files = glob.glob(f"{path_or_dir}/plugins/profile/*/*.xplane.pb") or [
        path_or_dir
    ]
    sp = xplane_pb2.XSpace()
    sp.ParseFromString(open(sorted(files)[-1], "rb").read())
    return sp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace")
    ap.add_argument("-n", type=int, default=40)
    ap.add_argument("--line-filter", default="")
    args = ap.parse_args()
    sp = load(args.trace)

    for plane in sp.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        evmeta = plane.event_metadata
        print(f"== plane: {plane.name} ==")
        per_op = collections.Counter()
        per_op_count = collections.Counter()
        total = 0
        for line in plane.lines:
            if args.line_filter and args.line_filter not in line.name:
                continue
            # XLA op lines carry the HLO ops; step lines carry whole steps
            for ev in line.events:
                md = evmeta[ev.metadata_id]
                dur = ev.duration_ps / 1e6  # ns->? ps->us
                per_op[md.name] += dur
                per_op_count[md.name] += 1
        tot = sum(per_op.values())
        lines_seen = {l.name: len(l.events) for l in plane.lines}
        print("lines:", lines_seen)
        for name, us in per_op.most_common(args.n):
            print(f"{us/1e3:10.3f} ms  {per_op_count[name]:6d}x  {name[:140]}")
        print(f"{tot/1e3:10.3f} ms TOTAL (incl. nested parents)")


if __name__ == "__main__":
    main()
