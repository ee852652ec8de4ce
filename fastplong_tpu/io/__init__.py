from .fastq import FastqStreamReader, RecordBlock
from .fasta import FastaReader
from .writer import Writer
