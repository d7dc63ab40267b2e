"""Incremental detokenizer unit tests with a fake tokenizer."""

from nanovllmx_tpu.utils.detokenizer import IncrementalDetokenizer


class CharTokenizer:
    """id <-> chr(id); id 999 is the first half of a two-token grapheme."""

    def decode(self, ids, skip_special_tokens=False):
        out = []
        i = 0
        while i < len(ids):
            if ids[i] == 999:
                if i + 1 < len(ids):
                    out.append("é")  # pair (999, x) renders as one char
                    i += 2
                    continue
                out.append("�")  # incomplete
                i += 1
                continue
            out.append(chr(ids[i]))
            i += 1
        return "".join(out)


def ids(s):
    return [ord(c) for c in s]


def test_simple_incremental():
    d = IncrementalDetokenizer(CharTokenizer())
    assert d.add_tokens(ids("he")) == ("he", False)
    assert d.add_tokens(ids("llo")) == ("llo", False)


def test_incomplete_grapheme_held_back():
    d = IncrementalDetokenizer(CharTokenizer())
    assert d.add_tokens(ids("a")) == ("a", False)
    assert d.add_tokens([999]) == ("", False)  # partial pair: hold
    text, stop = d.add_tokens([65])
    assert text == "é" and not stop


def test_stop_string_exact():
    d = IncrementalDetokenizer(CharTokenizer(), stop=["END"])
    t1, s1 = d.add_tokens(ids("abcEN"))
    # 'EN' held back: it could be a stop-string prefix
    assert (t1, s1) == ("abc", False)
    t2, s2 = d.add_tokens(ids("D"))
    assert s2 and t2 == ""  # stop matched; held chars never emitted


def test_holdback_flushed_on_finish():
    d = IncrementalDetokenizer(CharTokenizer(), stop=["END"])
    t1, _ = d.add_tokens(ids("abcEN"))
    assert t1 == "abc"
    assert d.flush() == "EN"  # finished without a stop: tail released


def test_stop_string_across_boundary():
    d = IncrementalDetokenizer(CharTokenizer(), stop=["XY"])
    t1, s1 = d.add_tokens(ids("aaX"))
    assert not s1
    t2, s2 = d.add_tokens(ids("Ybb"))
    assert s2
    assert (t1 + t2) == "aa"  # stop string and suffix never emitted


def test_stop_string_mid_chunk():
    d = IncrementalDetokenizer(CharTokenizer(), stop=["."])
    text, stop = d.add_tokens(ids("hello.world"))
    assert stop and text == "hello"


def test_earliest_stop_wins():
    d = IncrementalDetokenizer(CharTokenizer(), stop=["zz", "b"])
    text, stop = d.add_tokens(ids("abzz"))
    assert stop and text == "a"


def test_no_emission_after_stop():
    d = IncrementalDetokenizer(CharTokenizer(), stop=["!"])
    d.add_tokens(ids("hi!"))
    assert d.add_tokens(ids("more")) == ("", True)
