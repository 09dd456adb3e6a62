from gsalign_tpu.genome.fasta import read_fasta, trim_chromosome_name  # noqa: F401
from gsalign_tpu.genome.packing import (  # noqa: F401
    NT4_TABLE, Genome, pack_genome, codes_to_chars, chars_to_codes,
)
from gsalign_tpu.genome.coords import Coordinate, gen_coordinate_info  # noqa: F401
