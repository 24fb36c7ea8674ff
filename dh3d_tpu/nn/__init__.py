from dh3d_tpu.nn import backbones, layers  # noqa: F401
from dh3d_tpu.nn.model import DH3D, concat_tuple_clouds  # noqa: F401
