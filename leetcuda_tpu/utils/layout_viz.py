"""Grid/block layout visualizer — the swizzle-printer analog.

The reference ships ASCII visualizers for its XOR smem-swizzle patterns
(/root/reference/kernels/flash-attn/tools/print_swizzle_layout.py:28-60,
/root/reference/kernels/swizzle/print_swizzle_layout.py). TPU VMEM has no bank
conflicts, so the analog questions are:

- in what ORDER does the grid walk the output tiles (HBM locality — the
  block-swizzle analog, gemm/matmul.py _swizzled_ij), and
- which input block does each grid step map to (BlockSpec index_map audit).

Both are answered here with the same kind of ASCII grids the reference prints.
"""

from __future__ import annotations


def print_grid_walk(ni: int, nj: int, order, width: int = 4) -> str:
    """Render the visit order of an (ni, nj) output-tile grid.

    ``order``: iterable of (i, j) in visit sequence, or a callable
    t -> (i, j) (e.g. functools.partial(_swizzled_ij, ni=ni, nj=nj, group=g)).
    Returns (and prints) a grid whose cell (i, j) shows the step at which that
    tile is visited — contiguous runs down a column group indicate the A-panel
    stays resident, the reference's L2-locality goal.
    """
    if callable(order):
        order = [order(t) for t in range(ni * nj)]
    step_of = {}
    for t, (i, j) in enumerate(order):
        step_of[(i, j)] = t
    lines = []
    for i in range(ni):
        row = " ".join(f"{step_of.get((i, j), -1):>{width}d}"
                       for j in range(nj))
        lines.append(row)
    out = "\n".join(lines)
    print(out)
    return out


def print_block_layout(shape, block, index_map=None, grid=None,
                       width: int = 6) -> str:
    """Show which block index each grid step maps to for one operand.

    ``shape``/``block``: array and block shape (2-D). ``index_map``: the
    BlockSpec index_map (defaults to identity). Prints one line per grid step:
    step -> block coordinates -> element ranges. Mirrors how the reference's
    printers let you eyeball a layout before running it.
    """
    ni = -(-shape[0] // block[0])
    nj = -(-shape[1] // block[1])
    grid = grid or (ni, nj)
    index_map = index_map or (lambda *idx: idx)

    lines = []
    total = 1
    for g in grid:
        total *= g

    def unflatten(t):
        idx = []
        for g in reversed(grid):
            idx.append(t % g)
            t //= g
        return tuple(reversed(idx))

    for t in range(total):
        gidx = unflatten(t)
        bidx = index_map(*gidx)
        r0, c0 = bidx[0] * block[0], bidx[1] * block[1]
        lines.append(
            f"step {t:>{width}d} grid{gidx} -> block{tuple(bidx)} "
            f"= [{r0}:{r0 + block[0]}, {c0}:{c0 + block[1]}]")
    out = "\n".join(lines)
    print(out)
    return out
