"""Integration regression on the bundled Oxford demo data (the fidelity
gate of SURVEY.md §7.8): the 50-ref + 41-query clouds + GT pickles shipped
with the reference at `evaluate/global_eval/demo_data/`.

With no trained weights (the reference checkpoints' weight blobs are
missing upstream, `models/.MISSING_LARGE_BLOBS`), this validates pipeline
integrity end to end: load -> fixed-size normalize -> forward -> 256-d
descriptors -> cross-sequence recall curve, all shapes/metrics well-formed.
Once a trained checkpoint exists, the same test asserts paper-level recall.
"""

import os

import jax
import numpy as np
import pytest

DEMO = "/root/reference/evaluate/global_eval/demo_data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DEMO), reason="demo data not available"
)


@pytest.fixture(scope="module")
def demo_sets(tmp_path_factory):
    from dh3d_tpu import config as cfglib
    from dh3d_tpu.data import GlobalTestDataset
    from dh3d_tpu.eval import extract_global, load_sets_from_dir
    from dh3d_tpu.nn import DH3D

    N = 1024  # keep CPU runtime sane; full 8192 is the TPU drive's job
    cfg = cfglib.get_config("global_config")
    cfg.num_points = N
    model = DH3D(cfg)
    pts = np.zeros((1, N, 3), np.float32)
    variables = jax.jit(lambda k, p: model.init(k, p, train=False))(
        jax.random.PRNGKey(0), pts)

    out = str(tmp_path_factory.mktemp("desc"))
    for gt in ["global_ref_demo.pickle", "global_query_demo.pickle"]:
        ds = GlobalTestDataset(DEMO, os.path.join(DEMO, gt), numpts=N)
        extract_global(cfg, variables, ds, out, batch_size=4, model=model)

    ref = load_sets_from_dir(os.path.join(DEMO, "global_ref_demo.pickle"), out)
    query = load_sets_from_dir(
        os.path.join(DEMO, "global_query_demo.pickle"), out)
    return ref, query


def test_demo_extraction_counts(demo_sets):
    ref, query = demo_sets
    assert sorted(ref) == sorted(query)
    assert sum(len(s["desc"]) for s in ref.values()) == 100
    assert sum(len(s["desc"]) for s in query.values()) == 41
    for s in ref.values():
        assert s["desc"].shape[1] == 256
        np.testing.assert_allclose(
            np.linalg.norm(s["desc"], axis=1), 1.0, atol=1e-3)


def test_demo_recall_pipeline(demo_sets):
    from dh3d_tpu.eval import average_recalls, evaluate_sequences

    ref, query = demo_sets
    results = evaluate_sequences(ref, query, max_num_nn=25)
    assert len(results) == 2  # 2 seqs x 2 seqs minus the 2 self pairs
    avg, one_percent = average_recalls(results)
    assert avg.shape == (25,)
    assert np.all(np.diff(avg) >= -1e-9)  # recall curve is nondecreasing
    assert 0.0 <= one_percent <= 1.0
    # untrained network should still beat empty retrieval at rank 25
    assert avg[-1] > 0.0
