"""Markdown performance-table generator.

The reference's one real pytest suite emits a markdown perf table per run
(/root/reference/kernels/openai-triton/merge-attn-states/
test_merge_attn_states.py:56-93); the hgemm CLI prints best-so-far summaries
(hgemm.py:332-419). This module generalizes both over bench.harness results.
"""

from __future__ import annotations

from leetcuda_tpu.bench.harness import BenchResult


def markdown_table(results: list[BenchResult], baseline_tag: str | None = None
                   ) -> str:
    """Render results as a markdown table; if ``baseline_tag`` names one of
    them, add a speedup-vs-baseline column (the merge-attn-states pattern)."""
    base = next((r for r in results if r.tag == baseline_tag), None)
    cols = ["kernel", "mean ms", "TFLOPS", "GB/s"]
    if base:
        cols.append(f"vs {baseline_tag}")
    lines = ["| " + " | ".join(cols) + " |",
             "|" + "|".join("---" for _ in cols) + "|"]
    for r in results:
        row = [r.tag, f"{r.mean_ms:.4f}",
               f"{r.tflops:.2f}" if r.tflops else "-",
               f"{r.gbps:.1f}" if r.gbps else "-"]
        if base:
            row.append(f"{base.mean_ms / r.mean_ms:.2f}x")
        lines.append("| " + " | ".join(row) + " |")
    return "\n".join(lines)
