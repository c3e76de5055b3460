from . import zju_mocap, snapshot  # noqa: F401  (registers plugins)
from .loader import make_data_loader, make_dataset, collate

__all__ = ["make_data_loader", "make_dataset", "collate"]
