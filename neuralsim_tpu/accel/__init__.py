"""Acceleration structures (occupancy grids — SURVEY.md §2.9 accelerations)."""
from .occ_grid import (OccGridEma, OccGridEmaBatched,
                       OccGridEmaDynamic, OccGridState)
