from .index_store import (  # noqa: F401
    load_ivf_lists,
    load_lsh_bucket,
    load_lsh_partitions,
    save_ivf_index,
    save_lsh_index,
)
from .formats import (  # noqa: F401
    read_binary_dir,
    read_vectors_csv,
    read_vectors_json,
    read_vectors_orc,
    write_vectors_csv,
    write_vectors_json,
    write_vectors_orc,
)
