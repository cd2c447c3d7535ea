from .build import KmerIndex, build_kmer_index, build_position_keys  # noqa: F401
from .artifact import (  # noqa: F401
    IndexData,
    build_index,
    dump_json,
    load_index,
    read_index_options,
    save_index,
)
