from leetcuda_tpu.models.llama import (  # noqa: F401
    ModelConfig, init_params, forward, loss_fn, make_train_step, decode_step,
    init_kv_caches, tiny_config,
)
