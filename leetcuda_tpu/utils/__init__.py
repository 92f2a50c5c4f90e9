from leetcuda_tpu.utils.roofline import ChipSpec, V5E, roofline, RooflineReport
from leetcuda_tpu.utils.layout_viz import print_grid_walk, print_block_layout

__all__ = ["ChipSpec", "V5E", "roofline", "RooflineReport",
           "print_grid_walk", "print_block_layout"]
