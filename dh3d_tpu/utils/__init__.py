from dh3d_tpu.utils import transforms  # noqa: F401
