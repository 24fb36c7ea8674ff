from dh3d_tpu.data import augment, io  # noqa: F401
from dh3d_tpu.data.datasets import (  # noqa: F401
    GlobalTestDataset,
    GlobalTrainTriplet,
    LocalTestDataset,
    LocalTrainSelfPair,
    collate_global,
    collate_local,
)
