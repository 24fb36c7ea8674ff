"""Config presets, mirroring `core/configs.py`.

Same two-tier design as the reference: named presets composed by dict
update (`core/configs.py:146-153`) over a `dotdict` whose missing keys read
as None (`core/configs.py:22-26`) — the model relies on that behavior.
"""

from __future__ import annotations

import json


class dotdict(dict):
    """dot.notation dict with silent-None missing keys
    (`core/configs.py:22-26`)."""

    __getattr__ = dict.get
    __setattr__ = dict.__setitem__
    __delattr__ = dict.__delitem__


def basic_config():
    """Local-descriptor training preset (`core/configs.py:35-86`)."""
    return dotdict(
        # train
        training_local=True,
        extract_global=False,
        detection=False,
        freezedetection=False,
        freezebackbone=False,
        freezeglobal=False,
        local_backbone="backbone_local_dilate",
        add_batch_norm=True,
        loadpath=None,
        start_lr=5e-4,
        decay_step=5 * 2000,
        decay_rate=0.5,
        add_weight_decay=True,
        train_weight_decay=1e-5,
        # model
        init_feat_dim=32,
        featdim=128,
        knn_num=8,
        # data
        num_points=8192,
        batch_size=10,
        num_pos=1,
        num_neg=0,
        other_neg=False,
        input_R=True,
        data_aug=["Jitter"],
        sampled_kpnum=512,
        data_basedir=None,
        # loss
        add_local_loss=True,
        add_det_loss=False,
        add_global_loss=False,
        margin=1.0,
        neg_weight=5.0,
        local_loss="desc_local_loss",
        pos_r=0.5,
        search_r=20.0,
        local_loss_weight=1.0,
        savemodel_every_k_steps=200,
        # TPU-native extras (greenfield; see SURVEY.md §2.3)
        num_devices=1,          # data-parallel mesh size
        compute_dtype="float32",  # 'bfloat16' for the fast path
        # BN stats are global-batch (sync) for free under the global-view
        # jit trainer; bn_axis_name is only for shard_map trainers that
        # bind a named 'data' axis (see nn/model.py).
        bn_axis_name=None,
        # all-gather global descriptors across the mesh and mine hardest
        # negatives over the global batch (north-star item; greenfield)
        cross_device_mining=False,
        augment_on_device=False,  # jitted augmentation (global training)
        remat=False,              # rematerialize the backbone in backward
        # local training: generate rotation/FPS-anchors/1-NN inside the
        # jitted step (data/pairgen.py) instead of the host loader loop
        device_pairgen=False,
        rot_maxv=3.141592653589793,
        prefetch=2,               # host batch prefetch depth (0 = off)
        # Morton-order locality mode (DEFAULT): sort clouds along the
        # Z-order curve and use the banded one-hot-matmul kernels instead
        # of XLA gathers (TPU fast path).  Falls back to the gather path
        # automatically when N is not 256-divisible or on non-TPU
        # backends.
        morton_order=True,
        # Exact neighbor semantics under morton_order (DEFAULT): true kNN
        # everywhere + slot-compacted delivery of out-of-band neighbor
        # contributions — same candidate sets as the gather/parity path.
        # False = legacy approximate mode (banded kNN, in-band candidates
        # only; ~4-9% of neighbors replaced; see docs/ERROR_BUDGET.md).
        morton_exact=True,
        # input clouds (and any sample/knn indices) are already Z-order
        # sorted by the loader; skip the in-graph sort (training only)
        morton_presorted=False,
        # multiplier on the out-of-band plan capacities (per-tile window
        # AND global cap; banded_pallas.py:oob_plan).  Raise when the
        # oob_overflow invariant fires (train/trainer.py
        # check_oob_overflow) on data denser than the demo-cloud-tuned
        # defaults — exactness is then restored with no code edit.
        oob_cap_scale=1.0,
        grad_clip_norm=None,      # optional global-norm gradient clip
        # single-bf16-plane moments backward (threaded statically through
        # the model into the kernel's bwd_lo argument): ~3e-3 relative
        # gradient rounding for half the flex-conv backward-kernel work
        fast_grads=False,
    )


def detection_config():
    """Joint detector preset (`core/configs.py:88-102`)."""
    cfg = basic_config()
    cfg.detection = True
    cfg.detection_block = "detection_block"
    cfg.loadpath = None
    cfg.add_det_loss = True
    cfg.detection_loss = "local_detection_loss_nn"
    cfg.ar_th = 0.4
    cfg.det_k = 16
    cfg.ar_nn_k = 5
    cfg.det_loss_weight = 0.2
    # strict-parity fidelity toggle: reproduce the reference's
    # hardest-negative slot-index gather bug (`core/losses.py:94-98`)
    # instead of the corrected keypoint-id -> cloud-point-id mapping
    # (losses/losses.py, PARITY.md "detection loss hardest-negative
    # gather") — for A/B runs against a faithful reproduction.
    cfg.reproduce_ref_detloss_bug = False
    return cfg


def global_config():
    """Global-descriptor preset (`core/configs.py:104-144`)."""
    cfg = basic_config()
    cfg.training_local = False
    cfg.detection = False
    cfg.extract_global = True
    cfg.freezebackbone = True
    cfg.freezedetection = True
    cfg.start_lr = 5e-4
    cfg.decay_step = 20000
    cfg.decay_rate = 0.9
    cfg.global_backbone = "global_before_assemble"
    cfg.global_assemble = "global_netvald_block"
    cfg.concat_xyz = False
    cfg.sampled_kpnum = -1
    cfg.global_subsample = -1
    cfg.gl_dilate = 8
    cfg.gl_dims = [256]
    cfg.batch_size = 2
    cfg.num_pos = 2
    cfg.num_neg = 8
    cfg.other_neg = True
    cfg.input_R = False
    cfg.data_aug = ["Rotate1D", "Jitter", "RotateSmall"]
    cfg.add_local_loss = False
    cfg.add_det_loss = False
    cfg.add_global_loss = True
    cfg.global_loss = "lazy_quadruplet_loss"
    cfg.global_triplet_margin = 0.5
    cfg.global_quadruplet_margin = 0.2
    cfg.global_loss_weight = 1.0
    return cfg


_FACTORY = {
    "basic_config": basic_config,
    "detection_config": detection_config,
    "global_config": global_config,
}


def get_config(name: str) -> dotdict:
    """ConfigFactory(name).getconfig() equivalent
    (`core/configs.py:146-153`)."""
    if name not in _FACTORY:
        raise KeyError(f"unknown config '{name}'; have {sorted(_FACTORY)}")
    return _FACTORY[name]()


def save_config(cfg: dotdict, path: str):
    """Dump config json into the run dir (`core/utils.py:71-84`); that json
    is the source of truth for eval-time model config."""
    with open(path, "w") as f:
        json.dump({k: v for k, v in cfg.items()}, f, indent=2, default=str)


def load_config(path: str) -> dotdict:
    with open(path) as f:
        return dotdict(json.load(f))
