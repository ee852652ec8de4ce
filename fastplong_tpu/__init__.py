"""fastplong-tpu: TPU-native long-read FASTQ preprocessing and QC.

A from-scratch JAX/XLA/Pallas reimplementation of OpenGene/fastplong with
byte-identical outputs (see README.md).  Public entry points:

    from fastplong_tpu.main import main          # CLI
    from fastplong_tpu.config import Options     # programmatic config
    from fastplong_tpu.processor import process  # run a configured job
    from fastplong_tpu.models import Read, ReadPair, Sequence
"""

from .common import VERSION

__version__ = VERSION
