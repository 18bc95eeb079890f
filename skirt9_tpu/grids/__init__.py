"""Spatial grids flattened to device-resident tables.

Every grid type provides the same traversal interface consumed by the
transport engine (ref abstract: SKIRT/core/SpatialGrid.hpp:22):

  ncells          -> int (static)
  locate(pos)     -> (B,) int32 cell indices, -1 outside
  step(pos, dir, cell) -> (ds, next_cell, next_pos): one traversal step
  volumes()       -> (ncells,) cell volumes [m^3]
  cell_centers()  -> (ncells, 3)
  move_inside(pos, dir) -> (pos', cell, ds_to_entry): advance an outside
                      packet to the grid boundary (-1 cell if it misses)

Grids are pytrees (NamedTuples of arrays) so they can be closed over or
passed through jit boundaries without retracing on value changes.
"""
