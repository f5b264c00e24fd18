from nclt_slam_tpu.mapping.occupancy import (
    FREE_SAMPLES,
    cell_to_world,
    crop_window,
    empty_grid,
    in_bounds,
    inflate_cost,
    integrate_depth,
    occupancy_trinary,
    world_to_cell,
)

__all__ = [
    "FREE_SAMPLES",
    "cell_to_world",
    "crop_window",
    "empty_grid",
    "in_bounds",
    "inflate_cost",
    "integrate_depth",
    "occupancy_trinary",
    "world_to_cell",
]
