from leetcuda_tpu.data.loader import (  # noqa: F401
    TokenLoader, write_token_shard, read_token_shard)
