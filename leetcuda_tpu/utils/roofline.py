"""Roofline reporter — per-kernel speed-of-light accounting.

The reference publishes every kernel's TFLOPS next to the vendor library's
(e.g. /root/reference/kernels/hgemm/README.md:157-186) and reads ptxas
resource usage on every build. The TPU analog: compare measured time against
the chip's compute roof (MXU) and memory roof (HBM), report which bound is
active and the fraction of speed-of-light achieved.
"""

from __future__ import annotations

import dataclasses

import jax


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    name: str
    hbm_gbps: float            # HBM bandwidth, GB/s
    tflops: dict               # peak TFLOPS by compute dtype name
    vmem_mb: float = 128.0

    def peak_tflops(self, dtype) -> float:
        import jax.numpy as jnp

        d = jnp.dtype(dtype).name
        if d in self.tflops:
            return self.tflops[d]
        if d.startswith("float8") or d == "int8":
            return self.tflops.get("int8", self.tflops["bfloat16"])
        return self.tflops["float32"]


# published specs
V5E = ChipSpec("TPU v5e", hbm_gbps=819.0,
               tflops={"bfloat16": 197.0, "float16": 197.0,
                       "float32": 49.0, "int8": 394.0})
V5P = ChipSpec("TPU v5p", hbm_gbps=2765.0,
               tflops={"bfloat16": 459.0, "float16": 459.0,
                       "float32": 115.0, "int8": 918.0})
V6E = ChipSpec("TPU v6e", hbm_gbps=1640.0,
               tflops={"bfloat16": 918.0, "float16": 918.0,
                       "float32": 230.0, "int8": 1836.0})

_BY_KIND = {"v5 lite": V5E, "v5e": V5E, "v5p": V5P, "v6": V6E, "v6e": V6E}


def detect_chip() -> ChipSpec:
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return V5E
    for key, spec in _BY_KIND.items():
        if key in kind:
            return spec
    return V5E


@dataclasses.dataclass
class RooflineReport:
    flops: float
    bytes: float
    measured_s: float
    chip: ChipSpec
    compute_dtype: str

    @property
    def intensity(self) -> float:  # FLOP / byte
        return self.flops / max(self.bytes, 1.0)

    @property
    def compute_floor_s(self) -> float:
        return self.flops / (self.chip.peak_tflops(self.compute_dtype) * 1e12)

    @property
    def memory_floor_s(self) -> float:
        return self.bytes / (self.chip.hbm_gbps * 1e9)

    @property
    def bound(self) -> str:
        return ("compute" if self.compute_floor_s >= self.memory_floor_s
                else "memory")

    @property
    def sol_s(self) -> float:
        return max(self.compute_floor_s, self.memory_floor_s)

    @property
    def sol_pct(self) -> float:
        return 100.0 * self.sol_s / max(self.measured_s, 1e-12)

    def __str__(self):
        tf = self.flops / self.measured_s / 1e12
        gb = self.bytes / self.measured_s / 1e9
        return (f"{self.chip.name} [{self.compute_dtype}] "
                f"{tf:.1f} TFLOPS, {gb:.0f} GB/s, "
                f"intensity {self.intensity:.1f} FLOP/B -> {self.bound}-bound, "
                f"{self.sol_pct:.0f}% of speed-of-light "
                f"({self.sol_s * 1e6:.0f} us floor vs "
                f"{self.measured_s * 1e6:.0f} us measured)")


def roofline(flops: float, bytes: float, measured_s: float,
             compute_dtype="bfloat16", chip: ChipSpec | None = None
             ) -> RooflineReport:
    """Build a speed-of-light report for one kernel invocation."""
    import jax.numpy as jnp

    return RooflineReport(flops=flops, bytes=bytes, measured_s=measured_s,
                          chip=chip or detect_chip(),
                          compute_dtype=jnp.dtype(compute_dtype).name)
