from . import zju_mocap, snapshot, demo_datasets, mesh_dataset, tpose_dataset  # noqa: F401  (registers plugins)
from .loader import make_data_loader, make_dataset, collate

__all__ = ["make_data_loader", "make_dataset", "collate"]
