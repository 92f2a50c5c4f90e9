"""MXU matmul library — analog of /root/reference/kernels/{sgemm,hgemm}/ (toy-HGEMM).

The reference grades GEMM from naive CUDA cores to a 98–100%-of-cuBLAS MMA-PTX
pipeline (hgemm_mma_stage.cu:122-336): block tiles, k-slicing, cp.async multi-stage
smem pipelines, register double-buffering, block swizzle for L2 locality. The TPU
mapping (SURVEY.md §7.2):

- block tile (BM, BN, BK)      -> pl.BlockSpec blocks on a (M/BM, N/BN, K/BK) grid
- cp.async multi-stage pipeline -> Pallas's automatic double-buffered HBM→VMEM
                                   pipeline over sequential grid steps
- accumulate in registers       -> f32 VMEM scratch accumulator, written to the
                                   output block on the last K step
- smem swizzle / bank conflicts -> nonexistent on TPU (VMEM is not banked); the
                                   analog knob is tile shape & dtype tiling
- block swizzle (L2 reuse)      -> grid iteration order: a flattened 1-D grid with
                                   an index_map that walks output tiles in G-column
                                   groups, maximizing reuse of the resident A/B
                                   panels (HBM/CMEM locality)
- cuBLAS parity bar             -> XLA ``jnp.dot`` (dot_general), the vendor kernel

Layouts: NN (B as (K, N)) and TN (B stored (N, K), contracted on its last dim —
the reference's TN kernels, hgemm_mma_stage_tn.cu). Accumulation is always f32
(HMMA's f32 accumulator analog).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from leetcuda_tpu.core.runtime import cdiv, interpret_default
from leetcuda_tpu.core.registry import register_op


def _mm_kernel(layout, k_axis, K, bk, x_ref, y_ref, o_ref, acc_ref):
    """Shared matmul body. ``k_axis``: which grid dim sweeps K (2 on the 3-D grid,
    1 on the flattened swizzled grid). When K % bk != 0 the last K block's padding
    is undefined memory, so the invalid K columns of x are masked to zero — which
    zeroes their contribution regardless of y's padding garbage.
    """
    k = pl.program_id(k_axis)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    y = y_ref[:]
    if K % bk != 0:  # static: masking code only emitted for ragged K
        # mask BOTH operands' K tails: padding may hold NaN and 0*NaN = NaN
        xk = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        x = jnp.where(xk + k * bk < K, x, jnp.zeros_like(x))
        yk_dim = 0 if layout == "nn" else 1
        yk = jax.lax.broadcasted_iota(jnp.int32, y.shape, yk_dim)
        y = jnp.where(yk + k * bk < K, y, jnp.zeros_like(y))

    if layout == "nn":
        acc_ref[:] += jnp.dot(x, y, preferred_element_type=jnp.float32)
    else:
        # B block is (BN, BK); contract both operands on their last dim (A·Bᵀ)
        acc_ref[:] += jax.lax.dot_general(
            x, y,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(k == pl.num_programs(k_axis) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _swizzled_ij(t, ni, nj, group):
    """Map flat output-tile counter t -> (i, j) walking tiles in groups of
    ``group`` columns: all i for j in [g*group, (g+1)*group) before moving on.
    This is the reference's block-swizzle (hgemm_mma_stage.cu:1919-1921) with
    grid-order instead of blockIdx arithmetic: the A row-panel stays resident
    across a group; B column-panels are reused ni times in a row.

    The last group may be narrower (nj % group != 0 — or even nj < group);
    without the tail clamp j walks past nj and the index_map DMAs out of
    bounds (FAILED_PRECONDITION on hardware, found by tools/fuzz_gemm.py).
    """
    tiles_per_group = ni * group
    g = t // tiles_per_group
    r = t % tiles_per_group
    # tail-group width; plain-int path keeps the visualizer's values hashable
    cur = min(group, nj - g * group) if isinstance(t, int) else jnp.minimum(
        group, nj - g * group)
    i = r // cur
    j = g * group + r % cur
    return i, j


def make_matmul(
    *,
    block: tuple[int, int, int] = (512, 512, 512),
    layout: str = "nn",
    out_dtype=None,
    swizzle_group: int | None = None,
    vmem_limit_mb: int | None = None,
):
    """Build a jitted Pallas matmul.

    layout 'nn': x (M, K) @ y (K, N); layout 'tn': x (M, K) @ y (N, K)ᵀ.
    ``swizzle_group``: walk output tiles in groups of this many columns
    (block-swizzle analog). None = plain row-major (i, j) order.
    """
    assert layout in ("nn", "tn")

    @jax.jit
    def fn(x, y):
        M, K = x.shape
        if layout == "nn":
            K2, N = y.shape
        else:
            N, K2 = y.shape
        assert K == K2, (x.shape, y.shape)
        bm, bn, bk = block
        bm, bn, bk = min(bm, M), min(bn, N), min(bk, K)
        ni, nj, nk = cdiv(M, bm), cdiv(N, bn), cdiv(K, bk)
        odt = out_dtype or x.dtype

        if layout == "nn":
            y_block, y_map = (bk, bn), lambda i, j, k: (k, j)
        else:
            y_block, y_map = (bn, bk), lambda i, j, k: (j, k)

        params = {}
        if not interpret_default():
            params["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=(vmem_limit_mb or 100) * 1024 * 1024,
            )

        if swizzle_group is None:
            kernel = functools.partial(_mm_kernel, layout, 2, K, bk)
            grid = (ni, nj, nk)
            x_spec = pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                                  memory_space=pltpu.VMEM)
            y_spec = pl.BlockSpec(y_block, y_map, memory_space=pltpu.VMEM)
            o_spec = pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                                  memory_space=pltpu.VMEM)
        else:
            g = swizzle_group
            grid = (ni * nj, nk)

            def xi_map(t, k):
                i, j = _swizzled_ij(t, ni, nj, g)
                return (i, k)

            def yj_map(t, k):
                i, j = _swizzled_ij(t, ni, nj, g)
                return (k, j) if layout == "nn" else (j, k)

            def o_map(t, k):
                i, j = _swizzled_ij(t, ni, nj, g)
                return (i, j)

            if not interpret_default():
                params["compiler_params"] = pltpu.CompilerParams(
                    dimension_semantics=("arbitrary", "arbitrary"),
                    vmem_limit_bytes=(vmem_limit_mb or 100) * 1024 * 1024,
                )
            x_spec = pl.BlockSpec((bm, bk), xi_map, memory_space=pltpu.VMEM)
            y_spec = pl.BlockSpec(y_block, yj_map, memory_space=pltpu.VMEM)
            o_spec = pl.BlockSpec((bm, bn), o_map, memory_space=pltpu.VMEM)
            kernel = functools.partial(_mm_kernel, layout, 1, K, bk)

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, N), odt),
            grid=grid,
            in_specs=[x_spec, y_spec],
            out_specs=o_spec,
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=2 * M * N * K,
                bytes_accessed=(M * K + K * N) * x.dtype.itemsize
                + M * N * jnp.dtype(odt).itemsize,
                transcendentals=0,
            ),
            interpret=interpret_default(),
            **params,
        )(x, y)

    return fn


def matmul_ref(x, y):
    """The cuBLAS-analog oracle: XLA dot_general with f32 accumulation."""
    return jnp.dot(x, y, preferred_element_type=jnp.float32).astype(x.dtype)


def matmul_tn_ref(x, y):
    return jax.lax.dot_general(
        x, y, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)


def _mm_flops(x, y):
    M, K = x.shape
    N = y.shape[0] if y.shape[1] == K else y.shape[1]
    return float(2 * M * N * K)


# --- the graded ladder (reference naming lineage in tags) -------------------------
# naive        = whole-K blocks, no k-slicing      (sgemm.cu:21 naive analog)
# sliced_k     = k-sliced grid, f32 scratch accum  (sgemm.cu:42 sliced_k analog)
# stages       = big tiles, Pallas double-buffered pipeline (hgemm_mma_stage analog)
# stages+swz   = + grouped grid order              (block swizzle analog)
_VARIANTS = [
    # (name, dtype-ladder notes, block, layout, swizzle)
    ("sgemm_naive_f32", (256, 256, 99999), "nn", None),
    ("sgemm_sliced_k_f32", (256, 256, 256), "nn", None),
    ("sgemm_t_8x8_sliced_k_f32x4", (512, 512, 512), "nn", None),
    ("sgemm_t_8x8_sliced_k16_f32x4_pack_bcf_dbuf", (512, 1024, 512), "nn", None),
    ("sgemm_block_swizzle", (512, 512, 512), "nn", 4),
    ("hgemm_naive_f16", (256, 256, 99999), "nn", None),
    ("hgemm_sliced_k_f16", (256, 256, 256), "nn", None),
    ("hgemm_t_8x8_sliced_k_f16x8_pack_bcf_dbuf", (512, 512, 1024), "nn", None),
    ("hgemm_wmma_mma4x2_warp2x4_stages", (1024, 1024, 512), "nn", None),
    # flagship: tuned on v5e — 179.2 TFLOPS at 8192³ bf16 vs XLA dot's 175
    # (102% of the vendor bar; the reference's 98-100%-of-cuBLAS claim analog).
    # At 4096³ Pallas plateaus ~167 vs XLA ~190: all operands (96 MB) fit v5e's
    # 128 MB VMEM, so in a chained timing loop XLA keeps them resident with
    # zero HBM traffic — a regime pallas_call can't reach (operands stream
    # HBM->VMEM per block). 8192³ is the honest streaming comparison.
    ("hgemm_mma_stages_block_swizzle", (2048, 2048, 512), "nn", None),
    ("hgemm_mma_stages_tn", (2048, 2048, 512), "tn", None),
    ("hgemm_mma_stages_block_swizzle_tn_cute", (2048, 2048, 512), "tn", 4),
]

for _name, _blk, _layout, _swz in _VARIANTS:
    _ref = matmul_ref if _layout == "nn" else matmul_tn_ref
    register_op(
        _name,
        ref=_ref, flops=_mm_flops,
        atol=2e-2, rtol=2e-2,
        family="gemm",
        tags=(_layout, "swizzle" if _swz else "plain",
              "f16" if "hgemm" in _name else "f32"),
    )(make_matmul(block=_blk, layout=_layout, swizzle_group=_swz))


# production entry points (tuned on TPU v5e at 8192³ — see variant table)
matmul = make_matmul(block=(2048, 2048, 512))
sgemm = make_matmul(block=(512, 512, 512))
hgemm = make_matmul(block=(2048, 2048, 512))
hgemm_tn = make_matmul(block=(2048, 2048, 512), layout="tn")


# --- shape-adaptive config selection ----------------------------------------------

def pick_matmul_config(M: int, N: int, K: int, dtype=jnp.bfloat16,
                       layout: str = "nn") -> dict:
    """Choose (block, swizzle_group) from the problem shape — the analog of the
    reference's swizzle-stride auto-select (hgemm.py:198-208 picks the block-
    swizzle stride from N; here the whole tile config adapts).

    Rules (every rule measured on TPU v5e; artifacts PERF_SWEEP.json +
    TUNE_ROWS2.json, tools/tune_gemm_rows.py):
    - flagship tile is (2048, 2048): big MXU-aligned output tiles amortize
      the f32 accumulator writeback. At 8192³ the traffic-optimal 4096-long
      tiles tie it (1.026 vs 1.025) — re-read traffic is NOT the binding
      constraint on these compute-bound shapes, so the simpler tile wins.
    - bk = K when K ≤ 1024 (shallow K): the whole reduction lives in one
      grid step per tile — no exposed accumulator loop. Measured: the
      8192×8192×1024 row went 0.881 (bk=512) → 0.988 (bk=K). For DEEP K the
      opposite holds hard: bk=1024 at 8192³ collapsed to 0.80 (the double-
      buffered bk=512 stream is what hides HBM latency), so the rule cuts
      at exactly the single-step case.
    - wide-and-flat problems (N ≫ M or M ≫ N) rebalance the tile toward the
      long axis so the short axis doesn't fragment the grid (8192×1024×8192:
      (4096, 1024, 512) = 0.986; every bk=512 config there is ≥0.97, while
      4096-row tiles with bk ≥ 1024 collapse to 0.75-0.85).
    - tiles are clamped to the problem and the VMEM budget (~100 MB): cost
      x-block + y-block (×2 for the automatic double buffer) + f32 acc +
      out block, shrinking bk then bm/bn until it fits.
    - block swizzle (grouped grid walk) only pays when the B panel no longer
      fits cache-resident across a full row of output tiles; group=4 matches
      the measured sweet spot (gemm-swizzle variants).
    Known plateau, documented not hidden: 4096×14336×4096 (Llama-8B MLP
    aspect) sits at 0.935-0.938 across the whole 9-config family
    (TUNE_ROWS2.json) — traffic-optimal bm=M ties (2048, 2048, 512), so the
    residual is Mosaic kernel-internal, not tiling.
    """
    isz = jnp.dtype(dtype).itemsize

    def fits(bm, bn, bk):
        # double-buffered input blocks + f32 scratch + out block
        vmem = 2 * (bm * bk + bk * bn) * isz + bm * bn * 4 + bm * bn * isz
        return vmem <= 100 * 1024 * 1024

    bm, bn = 2048, 2048
    # rebalance toward the long axis for skewed problems (≥4x aspect)
    if N >= 4 * M:
        bm, bn = 1024, 4096
    elif M >= 4 * N:
        bm, bn = 4096, 1024
    bk = K if K <= 1024 else 512
    if bk >= 1024:
        # 4096-row tiles collapse when paired with a 1024-deep K step
        # (0.879 at 8192²×1024, 0.75 at 8192×1024×8192 w/ bk=1024 —
        # TUNE_ROWS2.json); 2048-row tiles take the same bk=K fine (0.988)
        bm = min(bm, 2048)
    bm, bn = min(bm, M), min(bn, N)

    # Snap to the padding-minimizing tile: a ragged grid computes the padded
    # region for nothing (3072 under a 2048 tile -> 2x2 grid of 2048-tiles =
    # 78% wasted MACs, measured 0.53x XLA in PERF_SWEEP). Candidates stay
    # (8,128)-aligned; tie-break toward the bigger tile.
    def _snap(dim, b):
        if dim % b == 0:
            return b
        cands = [c for c in (b, 1792, 1536, 1280, 1152, 1024, 896, 768,
                             640, 512, 384, 256) if c <= b]
        def waste(c):
            return (cdiv(dim, c) * c - dim) / dim
        return min(cands, key=lambda c: (round(waste(c), 4), -c))

    bm, bn = _snap(M, bm), _snap(N, bn)
    while not fits(bm, bn, bk) and bk > 128:
        bk //= 2
    while not fits(bm, bn, bk) and max(bm, bn) > 256:
        if bm >= bn:
            bm //= 2
        else:
            bn //= 2

    ni, nj = cdiv(M, bm), cdiv(N, bn)
    swz = 4 if (ni >= 4 and nj >= 8) else None
    return {"block": (bm, bn, bk), "layout": layout, "swizzle_group": swz}


@functools.lru_cache(maxsize=64)
def _auto_fn(M, N, K, dtype_name, layout):
    cfg = pick_matmul_config(M, N, K, jnp.dtype(dtype_name), layout)
    return make_matmul(**cfg)


def matmul_auto(x, y, *, layout: str = "nn"):
    """Matmul with shape-adaptive config selection (compiled fns cached per
    shape/dtype). The production entry point for arbitrary shapes."""
    M, K = x.shape
    N = y.shape[1] if layout == "nn" else y.shape[0]
    return _auto_fn(M, N, K, jnp.dtype(x.dtype).name, layout)(x, y)


# --- VMEM-resident chained matmul (the 4096-cubed regime) -------------------------

def make_matmul_resident(*, reps: int, block_m: int = 1024,
                         vmem_limit_mb: int = 100):
    """Chained A <- cast(A @ B) repeated ``reps`` times inside ONE pallas
    call, with both operands resident in VMEM throughout.

    Why: at 4096-cubed the whole working set fits v5e's 128 MB VMEM, and
    XLA times a chained scan with zero steady-state HBM traffic (operands
    live in the loop body's VMEM); a per-call ``pallas_call`` streams blocks
    from HBM every call and can't reach that regime (r1 PERF.md:32). This
    kernel expresses the same loop the way the hardware runs it:

    - B: whole-array VMEM input block, fetched once for the whole call;
    - because B is constant, A's row chunks evolve INDEPENDENTLY
      (C[i] = A[i] @ B^reps), so the grid is (M/block_m, reps) with reps
      innermost: chunk i loads once into a (block_m, K) VMEM scratch,
      multiplies by B reps times in place, and writes out ONCE — total HBM
      traffic for the whole call is A + B read and C written once, identical
      to XLA's scan, with rep-to-rep chunk evolution at VMEM speed.

    Element-for-element the same math as ``matmul_chain_ref`` (lax.scan of
    dots, cast to the input dtype each rep) — the correctness oracle and the
    XLA timing bar. VMEM at 4096-cubed bf16, block_m=1024: B 32 + chunk 8 +
    f32 intermediate 16 + in/out blocks ~24 = ~80 MB.
    """

    def kernel(a_ref, b_ref, o_ref, cur):
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _():
            cur[:] = a_ref[:]

        c = jnp.dot(cur[:], b_ref[:],
                    preferred_element_type=jnp.float32).astype(o_ref.dtype)
        cur[:] = c

        @pl.when(r == reps - 1)
        def _():
            o_ref[:] = c

    @jax.jit
    def fn(a, b):
        M, K = a.shape
        K2, N = b.shape
        assert K == K2 and K == N, "chained matmul needs square-compatible B"
        ni = cdiv(M, block_m)

        params = {}
        if not interpret_default():
            # "parallel" on i: the row chunks are independent — telling
            # Mosaic so was worth base 0.984 -> 0.998x XLA in the r4
            # ablation (candidate `parsem`, RESIDENT_ABLATE.json; the r3
            # session measured the same ordering at lower absolutes)
            params["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=vmem_limit_mb * 1024 * 1024,
            )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, N), a.dtype),
            grid=(ni, reps),
            in_specs=[
                pl.BlockSpec((block_m, K), lambda i, r: (i, 0),
                             memory_space=pltpu.VMEM),      # chunk, per-i
                pl.BlockSpec((K, N), lambda i, r: (0, 0),
                             memory_space=pltpu.VMEM),      # B: resident
            ],
            out_specs=pl.BlockSpec((block_m, N), lambda i, r: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((block_m, K), a.dtype)],
            cost_estimate=pl.CostEstimate(
                flops=2 * reps * M * N * K,
                bytes_accessed=(M * K + K * N + M * N) * a.dtype.itemsize,
                transcendentals=0,
            ),
            interpret=interpret_default(),
            **params,
        )(a, b)

    return fn


def matmul_chain_ref(a, b, reps: int):
    """XLA oracle/bar for the resident chain: scan of dots, cast each rep."""
    def body(c, _):
        return matmul_ref(c, b), None

    out, _ = jax.lax.scan(body, a, None, length=reps)
    return out


register_op(
    "hgemm_resident_chain",
    ref=functools.partial(matmul_chain_ref, reps=3),
    flops=lambda a, b: float(2 * 3 * a.shape[0] * a.shape[1] * b.shape[1]),
    atol=2e-2, rtol=2e-2,
    family="gemm-resident", tags=("f16", "resident"),
)(make_matmul_resident(reps=3, block_m=64))
