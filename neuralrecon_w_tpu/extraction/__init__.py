from .mesh import (
    MeshData,
    dense_eval_grid,
    extract_mesh,
    save_mesh_ply,
    sparse_eval_grid,
)

__all__ = [
    "MeshData", "dense_eval_grid", "extract_mesh", "save_mesh_ply",
    "sparse_eval_grid",
]
