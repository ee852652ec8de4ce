"""FASTA reader for adapter files.

Mirrors the reference's streaming '>'-delimited parser
(src/fastareader.cpp:47-101): header = text after '>' up to end of line,
sequence = following lines uppercased with invalid characters stripped
(only A-Z letters are kept).
"""

import re

_VALID = re.compile(rb"[^A-Za-z]")


class FastaReader:
    def __init__(self, fasta_file: str, force_upper_case: bool = True):
        self.filename = fasta_file
        self.force_upper_case = force_upper_case
        self.contigs = {}

    def read_all(self):
        with open(self.filename, "rb") as f:
            data = f.read()
        header = None
        seq_parts = []
        for line in data.split(b"\n"):
            line = line.rstrip(b"\r")
            if line.startswith(b">"):
                if header is not None:
                    self._store(header, seq_parts)
                header = line[1:].strip().decode("latin-1")
                seq_parts = []
            elif header is not None:
                seq_parts.append(_VALID.sub(b"", line))
        if header is not None:
            self._store(header, seq_parts)
        return self.contigs

    def _store(self, header, seq_parts):
        seq = b"".join(seq_parts)
        if self.force_upper_case:
            seq = seq.upper()
        self.contigs[header] = seq.decode("latin-1")
