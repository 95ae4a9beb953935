from mst_tpu.separation.scnet import SCNet, SCNetConfig
from mst_tpu.separation.demix import demix_track, SCNetSeparator

__all__ = ["SCNet", "SCNetConfig", "demix_track", "SCNetSeparator"]
