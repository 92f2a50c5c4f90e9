from leetcuda_tpu.attention.flash import (  # noqa: F401
    make_flash_attention,
    flash_attention,
    flash_attention_ref,
    mha_ref,
)
from leetcuda_tpu.attention.splitkv import flash_attention_splitkv  # noqa: F401
