"""Unit tests mirroring the reference gtest files (read_test.cpp,
sequence_test.cpp, nucleotidetree_test.cpp, evaluator_test.cpp)."""

from fastplong_tpu.models import Read, ReadPair, Sequence
from fastplong_tpu.nucleotidetree import NucleotideTree
from fastplong_tpu.evaluator import seq2int, int2seq, match_known_adapter


def test_sequence_reverse_complement():
    # reference test/sequence_test.cpp:4-9
    s = Sequence("AAAATTTTCCCCGGGG")
    rc = ~s
    assert s.mStr == "AAAATTTTCCCCGGGG"
    assert rc.mStr == "CCCCGGGGAAAATTTT"


def test_read_index_parsing():
    # reference test/read_test.cpp name-index helpers
    r = Read("@NS500713:64:HFKJJBGXY:1:11101:1675:1101 1:N:0:TATAGCCT+GACCCCCA",
             "ACGT", "+", "IIII")
    assert r.last_index() == "GACCCCCA"


def test_fast_merge():
    left = Read("@name", "TTTTAACCCCCCCCCCCCCCCCCCCCCCCCCCCCAATTTTAAAATTTT",
                "+", "IIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIIII")
    right = left.reverse_complement()
    merged = ReadPair(left, Read(right.name, right.seq, "+",
                                 right.quality)).fast_merge()
    assert merged is not None
    assert merged.seq == left.seq


def test_read_break_by_gap():
    r = Read("@n", "AAAACCCCGGGGTTTT", "+", "IIIIJJJJKKKKLLLL")
    out = r.break_by_gap(4, 8)
    assert len(out) == 2
    assert out[0].seq == "AAAA" and out[0].quality == "IIII"
    assert out[1].seq == "TTTT" and out[1].quality == "LLLL"
    assert out[0].name == "@split-by-adapter-left-n"
    assert out[1].name == "@split-by-adapter-right-n"


def test_read_break_by_regions():
    r = Read("@n", "AAAACCCCGGGGTTTT", "+", "IIIIJJJJKKKKLLLL")
    out = r.break_by_regions([(4, 7), (12, 13)])
    assert [x.seq for x in out] == ["AAAA", "GGGG", "TT"]
    assert [x.name for x in out] == ["@r1-n", "@r2-n", "@r3-n"]


def test_mask_region():
    r = Read("@n", "AAAACCCC", "+", "IIIIJJJJ")
    r.mask_region_with_n(2, 4)
    assert r.seq == "AANNNNCC"


def test_trim_front_clamp():
    r = Read("@n", "ACGT", "+", "IIII")
    r.trim_front(100)
    assert r.seq == "T"  # clamped to length-1


def test_nucleotide_tree():
    # reference test/nucleotidetree_test.cpp:5-19
    tree = NucleotideTree()
    for _ in range(100):
        tree.add_seq("AAAATTTT")
        tree.add_seq("AAAATTTTGGGG")
        tree.add_seq("AAAATTTTGGGGCCCC")
        tree.add_seq("AAAATTTTGGGGCCAA")
    tree.add_seq("AAAATTTTGGGACCCC")
    path, _ = tree.get_dominant_path()
    assert path == "AAAATTTTGGGGCC"


def test_seq2int_roundtrip():
    # reference test/evaluator_test.cpp:4-8
    s = "ATCGATCGAT"
    assert int2seq(seq2int(s, 0, 10, -1), 10) == s


def test_known_adapter_match():
    assert match_known_adapter(
        "AGATCGGAAGAGCACACGTCTGAACTCCAGTCAXXXX") \
        == "AGATCGGAAGAGCACACGTCTGAACTCCAGTCA"
    assert match_known_adapter("ZZZZ") == ""
