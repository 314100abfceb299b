import pytest

pytestmark = pytest.mark.smoke

import numpy as np

from fairfedmed_tpu.fed import (
    average_weights,
    average_weights_ema,
    shared_half_s_transform,
)


def _client_weights(seed, n_groups=3, rank=4):
    rng = np.random.default_rng(seed)
    return {
        "prompt_learner.ctx": rng.normal(size=(2, 4, 8)).astype(np.float32),
        "blocks.mlp.c_fc.lora_S": rng.normal(size=(n_groups, rank)).astype(np.float32),
        "blocks.mlp.c_fc.lora_A": rng.normal(size=(8, rank)).astype(np.float32),
    }


def test_average_weights_plain():
    w = [_client_weights(i) for i in range(3)]
    counts = [10, 30, 60]
    avg = average_weights(w, [0, 1, 2], counts)
    expect = 0.1 * w[0]["prompt_learner.ctx"] + 0.3 * w[1]["prompt_learner.ctx"] + 0.6 * w[2]["prompt_learner.ctx"]
    np.testing.assert_allclose(avg["prompt_learner.ctx"], expect, rtol=1e-5)


def test_average_weights_group_weighted_lora_s():
    w = [_client_weights(i) for i in range(2)]
    counts = [10, 10]
    by_attr = [[1, 9, 5], [9, 1, 5]]
    avg = average_weights(w, [0, 1], counts, by_attr)
    # group 0: client0 weight 0.1, client1 0.9; group 1 reversed; group 2: 0.5/0.5
    s0, s1 = w[0]["blocks.mlp.c_fc.lora_S"], w[1]["blocks.mlp.c_fc.lora_S"]
    expect = np.stack([
        0.1 * s0[0] + 0.9 * s1[0],
        0.9 * s0[1] + 0.1 * s1[1],
        0.5 * s0[2] + 0.5 * s1[2],
    ])
    np.testing.assert_allclose(avg["blocks.mlp.c_fc.lora_S"], expect, rtol=1e-5)
    # non-S keys still use plain example-count weights
    expect_a = 0.5 * w[0]["blocks.mlp.c_fc.lora_A"] + 0.5 * w[1]["blocks.mlp.c_fc.lora_A"]
    np.testing.assert_allclose(avg["blocks.mlp.c_fc.lora_A"], expect_a, rtol=1e-5)


def test_ema_decay_grows_with_round():
    w = [_client_weights(i) for i in range(2)]
    g = _client_weights(99)
    counts = [5, 5]
    out0 = average_weights_ema(g, w, [0, 1], counts, None, epoch=0, max_epoch=50)
    avg = average_weights(w, [0, 1], counts)
    # epoch 0 → beta_decay 0 → pure average
    np.testing.assert_allclose(out0["prompt_learner.ctx"], avg["prompt_learner.ctx"], rtol=1e-5)
    out25 = average_weights_ema(g, w, [0, 1], counts, None, epoch=25, max_epoch=50)
    bd = 0.999 * 25 / 50
    expect = (1 - bd) * avg["prompt_learner.ctx"] + bd * g["prompt_learner.ctx"]
    np.testing.assert_allclose(out25["prompt_learner.ctx"], expect, rtol=1e-5)


def test_shared_half_s():
    s = np.arange(12, dtype=np.float32).reshape(3, 4)
    out = shared_half_s_transform(s)
    np.testing.assert_allclose(out[:, :2], np.tile(s[:, :2].mean(0, keepdims=True), (3, 1)))
    np.testing.assert_allclose(out[:, 2:], s[:, 2:])


def test_ema_shared_half_s_applied_before_blend():
    n_groups, rank = 3, 4
    w = [_client_weights(i, n_groups, rank) for i in range(2)]
    g = _client_weights(7, n_groups, rank)
    counts = [5, 5]
    by_attr = [[1, 1, 1], [1, 1, 1]]
    out = average_weights_ema(g, w, [0, 1], counts, by_attr, epoch=10, max_epoch=50, shared_half_s=True)
    avg = average_weights(w, [0, 1], counts, by_attr)
    bd = 0.999 * 10 / 50
    expect = (1 - bd) * shared_half_s_transform(avg["blocks.mlp.c_fc.lora_S"]) + bd * g["blocks.mlp.c_fc.lora_S"]
    np.testing.assert_allclose(out["blocks.mlp.c_fc.lora_S"], expect, rtol=1e-5)


def test_sample_clients_round0_and_frac():
    """federated_main.py:606-613: round 0 trains everyone, later rounds draw
    max(int(frac*n),1) without replacement; explicit train list wins."""
    import numpy as np
    from fairfedmed_tpu.fed import sample_clients

    assert sample_clients(5, 0.4, epoch=0) == [0, 1, 2, 3, 4]
    np.random.seed(0)
    picked = sample_clients(5, 0.4, epoch=3)
    assert len(picked) == 2 and len(set(picked)) == 2
    assert sample_clients(5, 0.0, epoch=3) != []  # at least one client
    assert sample_clients(5, 0.4, epoch=3, idxs_users_train=[2, 4]) == [2, 4]


def test_group_weights_zero_member_group_falls_back_to_uniform():
    """A group with zero members among selected clients must yield uniform
    client weights, not 0/0 NaN (reference fed_utils.py:29-38 NaNs here;
    shared_half_s would then spread the NaN across every group's S)."""
    from fairfedmed_tpu.fed.aggregate import _freqs

    counts = [10, 6]
    by_attr = [[4, 6, 0], [2, 4, 0]]  # group 2 empty on BOTH clients
    freqs, freqs_by_attr = _freqs([0, 1], counts, by_attr)
    for r in (0, 1):
        assert np.isfinite(freqs_by_attr[r]).all()
        assert freqs_by_attr[r][2] == 0.5  # uniform over the 2 clients
    np.testing.assert_allclose(freqs_by_attr[0][:2], [4 / 6, 6 / 10])
