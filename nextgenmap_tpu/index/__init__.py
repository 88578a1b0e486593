from nextgenmap_tpu.index.genome import Genome  # noqa: F401
from nextgenmap_tpu.index.kmer_index import KmerIndex  # noqa: F401
