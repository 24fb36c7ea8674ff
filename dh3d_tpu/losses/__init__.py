from dh3d_tpu.losses.losses import (  # noqa: F401
    DETECTION_LOSSES,
    GLOBAL_LOSSES,
    LOCAL_LOSSES,
    batch_hard_quadruplet_loss,
    batch_hard_triplet_loss,
    best_pos_distance,
    compute_total_loss,
    desc_local_loss,
    lazy_quadruplet_loss,
    lazy_triplet_loss,
    local_detection_loss_nn,
    pairwise_dist,
)
