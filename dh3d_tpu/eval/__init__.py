from dh3d_tpu.eval.extract import extract_global, extract_local  # noqa: F401
from dh3d_tpu.eval.matlab_extras import (  # noqa: F401
    find_point_normals,
    prec_rec,
)
from dh3d_tpu.eval.nms import (  # noqa: F401
    device_nms,
    nms_keypoint_indices,
    single_nms,
)
from dh3d_tpu.eval.registration import (  # noqa: F401
    RansacResult,
    match_descriptors_mutual,
    ransac_rigid,
    register_clouds,
    registration_success,
)
from dh3d_tpu.eval.retrieval import (  # noqa: F401
    average_recalls,
    compute_tp_fp,
    evaluate_sequences,
    is_gt_match_2d,
    load_sets_from_dir,
    retrieve,
)
from dh3d_tpu.eval.repeatability import (  # noqa: F401
    keypoint_repeatability,
    repeatability_curve,
    top_k_keypoints,
)
