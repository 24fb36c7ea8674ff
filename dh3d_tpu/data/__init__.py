from dh3d_tpu.data import augment, io  # noqa: F401
from dh3d_tpu.data.pairgen import device_local_pairs  # noqa: F401
from dh3d_tpu.data.prefetch import ThreadedPrefetcher  # noqa: F401
from dh3d_tpu.data.datasets import (  # noqa: F401
    GlobalTestDataset,
    GlobalTrainTriplet,
    LocalTestDataset,
    LocalTrainSelfPair,
    collate_global,
    collate_local,
)
