from .introspect import (  # noqa: F401
    broadcast_join_count,
    formatted_plan,
    partition_filters,
    pushed_filters,
    shuffle_count,
)
