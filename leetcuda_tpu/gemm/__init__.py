from leetcuda_tpu.gemm.matmul import (  # noqa: F401
    make_matmul,
    matmul,
    hgemm,
    sgemm,
    matmul_ref,
)
from leetcuda_tpu.gemm.quant import (  # noqa: F401
    quantize_rowwise_int8,
    make_matmul_w8a16,
    matmul_w8a16_ref,
)
