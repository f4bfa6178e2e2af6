from . import fasta, gfa, gaf  # noqa: F401
