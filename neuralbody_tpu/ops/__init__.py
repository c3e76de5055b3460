from .embedder import positional_encoding, xyz_encoder, view_encoder, embed_dim
from .grid_sample import grid_sample_3d, multiscale_grid_sample
from .compositing import raw2outputs
from .sample_pdf import sample_pdf
from .ray_ops import stratified_z_vals, sample_along_rays

__all__ = [
    "positional_encoding", "xyz_encoder", "view_encoder", "embed_dim",
    "grid_sample_3d", "multiscale_grid_sample",
    "raw2outputs", "sample_pdf",
    "stratified_z_vals", "sample_along_rays",
]
