"""Round-4 training-feature tests (VERDICT r3 items #3/#4 + weak #5 +
missing #5):

- ``cond_stage_trainable`` wired end-to-end: cond-stage params join the
  optimizer/EMA/checkpoint and actually receive nonzero grads
  (ref ``ddpm.py:509-528,1361-1366``; configs like cin256-v2.yaml declare it);
- ``scale_by_std`` first-batch latent calibration (ref ``ddpm.py:476-491``),
  incl. persistence through checkpoint/resume;
- ``learn_logvar`` trainable per-t logvar (ref ``ddpm.py:111-114,1367-1369``);
- multi-host ``process_index`` data sharding in ``data/base.py`` with mocked
  process counts.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from sd_tpu.training import LDMTrainer
from sd_tpu.utils.config import build_latent_diffusion
from sd_tpu.utils.testing import tiny_class_cond_model_config, tiny_sd_model_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_batch(n=4, vocab=64, size=32):
    rng = np.random.default_rng(0)
    return {
        "image": rng.standard_normal((n, size, size, 3)).astype(np.float32) * 0.5,
        "caption": rng.integers(0, vocab, (n, 8)).astype(np.int32),
        "class_label": rng.integers(0, 17, (n,)).astype(np.int32),
    }


# ------------------------------------------------------ cond_stage_trainable


def test_cond_stage_trainable_updates_encoder():
    """cin256-v2-shaped tiny config (ClassEmbedder cond stage): with
    cond_stage_trainable the encoder gets nonzero grads and updates, and is
    covered by the EMA shadow; without it, it stays frozen and out of the
    optimizer state."""
    ldm = build_latent_diffusion(tiny_class_cond_model_config(),
                                 rng=jax.random.PRNGKey(3))
    frozen_cond = jax.tree.map(np.asarray, ldm.cond_stage_params)

    tr = LDMTrainer(ldm=ldm, optimizer=optax.adamw(1e-3),
                    train_cond_stage=True)
    state = tr.init_state()
    assert "cond_stage" in state.params
    assert "cond_stage" in state.ema.shadow  # EMA covers the trained encoder

    step = jax.jit(tr.train_step)
    for i in range(5):
        state, aux = step(state, make_batch(), jax.random.PRNGKey(i))

    # nonzero grads flow into the cond stage. (NOT at step 0: the zero-init
    # proj_out of every SpatialTransformer — the reference's zero_module
    # contract, attention.py:244 — makes dL/dcontext exactly zero until the
    # first update moves proj_out. Same in torch.)
    g = jax.grad(lambda p: tr.loss_fn(p, make_batch(), jax.random.PRNGKey(0))[0])(
        state.params)
    gmax = max(float(jnp.abs(x).max()) for x in jax.tree.leaves(g["cond_stage"]))
    assert gmax > 0, "cond-stage grads are identically zero"
    moved = jax.tree.map(
        lambda a, b: float(jnp.abs(jnp.asarray(a, jnp.float32)
                                   - jnp.asarray(b, jnp.float32)).max()),
        frozen_cond, state.params["cond_stage"])
    assert max(jax.tree.leaves(moved)) > 0, "cond-stage params never updated"


def test_cond_stage_frozen_by_default():
    ldm = build_latent_diffusion(tiny_class_cond_model_config(),
                                 rng=jax.random.PRNGKey(3))
    tr = LDMTrainer(ldm=ldm, optimizer=optax.adamw(1e-3))
    state = tr.init_state()
    assert "cond_stage" not in state.params


def test_main_cli_wires_cond_stage_trainable(tmp_path):
    """main.py must read cond_stage_trainable from the YAML and pass it to
    the LDMTrainer (the r3 silent-freeze hazard: 8 shipped reference configs
    declare it)."""
    env = dict(os.environ, SD_TPU_PLATFORM="cpu")
    proc = subprocess.run(
        [sys.executable, "main.py", "-t",
         "--base", "configs/sd_tpu/tiny-txt2img.yaml",
         "--max_steps", "2", "--logdir", str(tmp_path),
         "model.params.cond_stage_trainable=true"],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, (proc.stdout[-1500:], proc.stderr[-1500:])
    assert "Also optimizing conditioner params!" in proc.stdout


# ------------------------------------------------------------- scale_by_std


def test_scale_by_std_calibration():
    """scale_factor = 1/std(z) from the first batch, computed at scale 1
    (ddpm.py:476-491, torch's unbiased std); post-calibration latents have
    unit std on that batch."""
    cfg = tiny_sd_model_config()
    cfg["params"]["scale_factor"] = 1.0
    ldm = build_latent_diffusion(cfg, rng=jax.random.PRNGKey(5))
    tr = LDMTrainer(ldm=ldm, optimizer=optax.adamw(1e-3), scale_by_std=True)

    batch = make_batch(8)
    key = jax.random.PRNGKey(11)
    z_raw = ldm.encode_to_latent(jnp.asarray(batch["image"]), rng=key)
    expected = 1.0 / float(jnp.std(z_raw.reshape(-1), ddof=1))

    scale = tr.calibrate_scale_by_std(batch, key)
    np.testing.assert_allclose(scale, expected, rtol=1e-6)
    assert tr.ldm.scale_factor == scale  # mutated in place

    z_cal = tr.ldm.encode_to_latent(jnp.asarray(batch["image"]), rng=key)
    np.testing.assert_allclose(float(jnp.std(z_cal.reshape(-1), ddof=1)),
                               1.0, rtol=1e-5)


def test_scale_by_std_rejects_custom_scale():
    ldm = build_latent_diffusion(tiny_sd_model_config(),
                                 rng=jax.random.PRNGKey(5))
    assert ldm.scale_factor != 1.0  # tiny config ships 0.18215
    tr = LDMTrainer(ldm=ldm, optimizer=optax.adamw(1e-3), scale_by_std=True)
    with pytest.raises(AssertionError):
        tr.calibrate_scale_by_std(make_batch(), jax.random.PRNGKey(0))


class _Data:
    def __init__(self, n=4):
        self.n = n

    def train_dataloader(self):
        def gen():
            while True:
                yield make_batch(self.n)
        return gen()

    def val_dataloader(self):
        return None


def test_scale_by_std_through_fit_and_resume(tmp_path):
    """Trainer.fit calibrates once on a fresh run, persists the value in the
    checkpoint sidecar, and a resumed run restores it WITHOUT recalibrating
    (the reference gates on ``restarted_from_ckpt``)."""
    from sd_tpu.training.trainer import Trainer

    cfg = tiny_sd_model_config()
    cfg["params"]["scale_factor"] = 1.0

    ldm = build_latent_diffusion(cfg, rng=jax.random.PRNGKey(7))
    tr = LDMTrainer(ldm=ldm, optimizer=optax.adamw(1e-3), scale_by_std=True)
    harness = Trainer(trainer_obj=tr, ldm=tr.ldm, logdir=str(tmp_path),
                      max_steps=2, log_every=1)
    harness.fit(tr.init_state(), _Data())
    scale = tr.ldm.scale_factor
    assert scale != 1.0

    meta_path = os.path.join(str(tmp_path), "checkpoints", "last",
                             "sd_tpu_meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    np.testing.assert_allclose(meta["scale_factor"], scale, rtol=1e-6)

    # resume with a FRESH model (scale 1.0): restored, not recalibrated
    ldm2 = build_latent_diffusion(cfg, rng=jax.random.PRNGKey(7))
    tr2 = LDMTrainer(ldm=ldm2, optimizer=optax.adamw(1e-3), scale_by_std=True)
    harness2 = Trainer(trainer_obj=tr2, ldm=tr2.ldm, logdir=str(tmp_path),
                       max_steps=2, log_every=1)
    harness2.fit(tr2.init_state(), _Data(), resume=True)
    np.testing.assert_allclose(tr2.ldm.scale_factor, scale, rtol=1e-6)


# ------------------------------------------------------------- learn_logvar


def test_learn_logvar_leaf_trains():
    ldm = build_latent_diffusion(tiny_sd_model_config(),
                                 rng=jax.random.PRNGKey(9))
    tr = LDMTrainer(ldm=ldm, optimizer=optax.adamw(1e-2),
                    learn_logvar=True, logvar_init=0.5)
    state = tr.init_state()
    lv = state.params["logvar"]
    assert lv.shape == (ldm.schedule.num_timesteps,)
    np.testing.assert_allclose(np.asarray(lv), 0.5)

    # at init the loss obeys loss_simple/exp(lv) + lv with lv = 0.5 everywhere
    loss, aux = tr.loss_fn(state.params, make_batch(), jax.random.PRNGKey(0))
    expect = float(aux["loss_simple"]) / np.exp(0.5) + 0.5
    np.testing.assert_allclose(float(loss), expect, rtol=2e-3)

    step = jax.jit(tr.train_step)
    new_state, _ = step(state, make_batch(), jax.random.PRNGKey(1))
    assert float(jnp.abs(new_state.params["logvar"] - 0.5).max()) > 0


def test_static_logvar_init_applied():
    """learn_logvar=False but logvar_init!=0: the static table still weights
    the loss (ddpm.py:112 fills logvar regardless of learnability)."""
    ldm = build_latent_diffusion(tiny_sd_model_config(),
                                 rng=jax.random.PRNGKey(9))
    batch = make_batch()
    tr0 = LDMTrainer(ldm=ldm, optimizer=optax.adamw(1e-3))
    tr1 = LDMTrainer(ldm=ldm, optimizer=optax.adamw(1e-3), logvar_init=1.0)
    s0, s1 = tr0.init_state(), tr1.init_state()
    assert "logvar" not in s1.params  # static: NOT a trainable leaf
    l0, a0 = tr0.loss_fn(s0.params, batch, jax.random.PRNGKey(0))
    l1, a1 = tr1.loss_fn(s1.params, batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(l1),
                               float(a1["loss_simple"]) / np.e + 1.0, rtol=2e-3)
    assert abs(float(l0) - float(l1)) > 1e-3


# ------------------------------------------- multi-host data sharding (weak #5)


def test_dataloader_process_sharding_partitions_dataset():
    """Map-style loader with num_shards=jax.process_count() mock: shards are
    disjoint and jointly cover the dataset (main.py:146-159 analog)."""
    from sd_tpu.data.base import DataLoader
    from sd_tpu.data.synthetic import SyntheticImages

    # a probe dataset that encodes the sample index
    class Probe(SyntheticImages):
        def __getitem__(self, i):
            return {"idx": np.int32(i)}

    pds = Probe(size=8, length=24, caption_tokens=0)
    all_idx = []
    for shard in range(3):
        dl = DataLoader(pds, batch_size=2, shuffle=False,
                        num_shards=3, shard_index=shard)
        all_idx.append([int(i) for b in dl for i in b["idx"]])
    flat = sum(all_idx, [])
    assert sorted(flat) == list(range(24))           # full disjoint cover
    assert not (set(all_idx[0]) & set(all_idx[1]))   # pairwise disjoint


def test_dataloader_sharded_shuffle_consistent_across_hosts():
    """With shuffle on, every mocked host must derive the SAME global
    permutation (seeded by epoch) so the shards stay disjoint."""
    from sd_tpu.data.base import DataLoader

    class Probe:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            return {"idx": np.int32(i)}

    shards = []
    for shard in range(4):
        dl = DataLoader(Probe(), batch_size=2, shuffle=True, seed=7,
                        num_shards=4, shard_index=shard)
        shards.append([int(i) for b in dl for i in b["idx"]])
    flat = sum(shards, [])
    assert sorted(flat) == list(range(16))
    assert flat != list(range(16))  # actually shuffled


def test_iterable_dataset_process_sharding():
    """Txt2ImgIterableBaseDataset.shard splits valid_ids across mocked
    workers (ldm/data/base.py:5-23 + main.py:152-157)."""
    from sd_tpu.data.base import DataLoader, Txt2ImgIterableBaseDataset

    class Stream(Txt2ImgIterableBaseDataset):
        def __iter__(self):
            for i in self.sample_ids:
                yield {"idx": np.int32(i)}

    got = []
    for shard in range(3):
        ds = Stream(num_records=10)
        dl = DataLoader(ds, batch_size=1, num_shards=3, shard_index=shard)
        got.append([int(b["idx"][0]) for b in dl])
    flat = sum(got, [])
    assert sorted(flat) == list(range(10))
    assert not (set(got[0]) & set(got[1]))
