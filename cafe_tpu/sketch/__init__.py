from .hotsketch import (
    HotSketchConfig,
    HotSketchState,
    init_sketch,
    sketch_query,
    sketch_insert,
    rebuild_free_list,
    analyse,
    analyse_tracked,
    hot_fraction,
)
from .oracle import OracleSketch

__all__ = [
    "HotSketchConfig",
    "HotSketchState",
    "init_sketch",
    "sketch_query",
    "sketch_insert",
    "rebuild_free_list",
    "analyse",
    "analyse_tracked",
    "hot_fraction",
    "OracleSketch",
]
