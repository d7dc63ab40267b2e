"""Device-kind -> HBM fallback table (VERDICT r4 Weak #6: the old table
matched v5p under the generic "v5" arm and sized the pool to 31 GiB on a
95 GB chip)."""

from nanovllmx_tpu.runner.model_runner import _hbm_limit_for_kind

GIB = 2**30


def test_v5e_variants():
    for kind in ("TPU v5 lite", "tpu v5e", "TPU v5lite pod"):
        assert _hbm_limit_for_kind(kind) == int(15.75 * GIB)


def test_v5p_is_not_the_generic_v5_arm():
    assert _hbm_limit_for_kind("TPU v5p") == 92 * GIB
    assert _hbm_limit_for_kind("TPU v5") == int(15.75 * GIB)


def test_v4_and_v6():
    assert _hbm_limit_for_kind("TPU v4") == 31 * GIB
    assert _hbm_limit_for_kind("TPU v6e") == int(31.25 * GIB)
    assert _hbm_limit_for_kind("TPU v6 lite") == int(31.25 * GIB)


def test_unknown_kind_conservative():
    assert _hbm_limit_for_kind("TPU v9 hyperlite") == int(15.75 * GIB)
    assert _hbm_limit_for_kind(None) == int(15.75 * GIB)
