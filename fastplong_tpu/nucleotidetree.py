"""Nucleotide trie for consensus extension.

Host equivalent of the reference NucleotideTree (src/nucleotidetree.cpp):
an 8-way trie over (base & 0x07) with dominant-path extraction (>=95%
dominance, >=50 support).  Used by the legacy seed-based adapter detection
path (Evaluator::getAdapterWithSeed, src/evaluator.cpp:410-463).
"""


class NucleotideNode:
    __slots__ = ("count", "base", "children")

    def __init__(self):
        self.count = 0
        self.base = "N"
        self.children = [None] * 8


class NucleotideTree:
    RATIO_THRESHOLD = 0.95
    NUM_THRESHOLD = 50

    def __init__(self, opt=None):
        self.opt = opt
        self.root = NucleotideNode()

    def add_seq(self, seq: str):
        cur = self.root
        for ch in seq:
            if ch == "N":
                break
            b = ord(ch) & 0x07
            if cur.children[b] is None:
                cur.children[b] = NucleotideNode()
                cur.children[b].base = ch
            cur.children[b].count += 1
            cur = cur.children[b]

    def get_dominant_path(self):
        """Returns (path, reached_leaf)."""
        out = []
        reached_leaf = True
        cur = self.root
        while True:
            total = sum(c.count for c in cur.children if c is not None)
            if total < self.NUM_THRESHOLD:
                break
            dominant = None
            for c in cur.children:
                if c is not None and c.count / total >= self.RATIO_THRESHOLD:
                    dominant = c
                    break
            if dominant is None:
                reached_leaf = False
                break
            out.append(dominant.base)
            cur = dominant
        return "".join(out), reached_leaf
