from .index_store import (  # noqa: F401
    load_ivf_lists,
    load_lsh_bucket,
    save_ivf_index,
    save_lsh_index,
)
