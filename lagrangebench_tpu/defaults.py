"""Default configuration tree and validation.

The key layout matches the reference's canonical config (reference
lagrangebench/defaults.py:7-176) so existing YAML presets work unchanged.
TPU-first deltas (documented here, not silently changed):

* ``dtype`` defaults to ``float32`` — float64 is emulated (slow) on TPU.
  ``float64`` remains available for CPU parity testing.
* ``neighbors.backend`` defaults to ``celllist`` (our fixed-capacity XLA
  cell-list). The reference backend names (``jaxmd_vmap``, ``jaxmd_scan``,
  ``matscipy``) are accepted as aliases and mapped to our backends so
  reference configs run as-is.
* The training DataLoader reads ``train.batch_size`` and the in-training
  validation loader reads ``eval.train.batch_size`` (the reference aliases
  BOTH to eval-side batch sizes — a quirk we do not copy, reference
  lagrangebench/train/trainer.py:170-173).
* New ``parallel`` section for device-mesh data parallelism over ICI.
"""

from __future__ import annotations

from .config import Config

#: mapping from reference backend names to TPU-native backends
BACKEND_ALIASES = {
    "jaxmd_vmap": "celllist",
    "jaxmd_scan": "celllist",
    "matscipy": "celllist",
}

VALID_BACKENDS = ("allpairs", "celllist", "pallas")


def set_defaults() -> Config:
    """Build the default config tree."""
    cfg = Config()

    # -- global -----------------------------------------------------------
    cfg.config = None  # config file path ("config" or "load_ckp" required)
    cfg.load_ckp = None  # checkpoint directory to restore
    cfg.mode = "all"  # one of "train", "infer", "all"
    cfg.seed = 0
    cfg.dtype = "float32"  # preprocessing dtype ("float32" | "float64")
    cfg.gpu = None  # accepted for reference-config compat; unused on TPU
    cfg.xla_mem_fraction = None  # accepted for compat; unused on TPU

    # -- dataset ------------------------------------------------------------
    cfg.dataset = Config()
    cfg.dataset.src = None  # path to the dataset directory
    cfg.dataset.name = None  # dataset name (inferred from src if None)

    # -- model ---------------------------------------------------------------
    cfg.model = Config()
    cfg.model.name = None  # gns | segnn | egnn | painn | linear
    cfg.model.input_seq_length = 6  # number of past positions fed to the model
    cfg.model.num_mp_steps = 10  # message-passing steps
    cfg.model.num_mlp_layers = 2  # layers per MLP block
    cfg.model.latent_dim = 128  # hidden width
    cfg.model.magnitude_features = False  # append |v| node features
    cfg.model.isotropic_norm = False  # normalize all dimensions equally
    # MLP compute precision: "bfloat16" engages the TPU MXU full-rate path
    # (params stay float32); "float32" for exact-parity work
    cfg.model.compute_dtype = "float32"
    # GNS fast path: one fused Pallas kernel per MP step (forward AND
    # backward — trainable). Requires the dense edge layout and
    # num_mlp_layers=2; falls back to the identical-math XLA mirror
    # off-TPU. Its parameter layout differs from the standard processor —
    # convert existing standard checkpoints with
    # models.gns.fused_params_from_standard. Shipped GNS presets enable it.
    cfg.model.fused_processor = False

    # SEGNN-only
    cfg.model.lmax_attributes = 1
    cfg.model.lmax_hidden = 1
    cfg.model.segnn_norm = "none"  # instance | batch | none
    cfg.model.velocity_aggregate = "avg"  # avg | last

    # -- training ------------------------------------------------------------
    cfg.train = Config()
    cfg.train.batch_size = 1
    cfg.train.step_max = 500_000
    cfg.train.num_workers = 2  # prefetcher threads
    cfg.train.noise_std = 3.0e-4  # GNS random-walk noise std at the last step
    # How often (in steps) the trainer READS the neighbor-overflow flag.
    # 1 = reference-exact per-batch retry, but the read is a blocking
    # host<->device sync that stalls dispatch pipelining (a full ~28 ms
    # round trip on remote-attached runtimes). >1 defers detection: the
    # step's conditional commit makes every post-overflow step a no-op, so
    # a late read loses at most sync_every-1 batches (skipped, never
    # corrupted) per (rare) overflow event before the reallocation retry.
    cfg.train.overflow_sync_every = 1

    cfg.train.optimizer = Config()
    cfg.train.optimizer.lr_start = 1.0e-4
    cfg.train.optimizer.lr_final = 1.0e-6
    cfg.train.optimizer.lr_decay_rate = 0.1
    cfg.train.optimizer.lr_decay_steps = 1.0e5

    cfg.train.pushforward = Config()
    # training step thresholds at which the next unroll stage activates
    cfg.train.pushforward.steps = [-1, 20000, 300000, 400000]
    cfg.train.pushforward.unrolls = [0, 1, 2, 3]
    cfg.train.pushforward.probs = [18, 2, 1, 1]

    cfg.train.loss_weight = Config()
    cfg.train.loss_weight.acc = 1.0
    cfg.train.loss_weight.vel = 0.0
    cfg.train.loss_weight.pos = 0.0

    # -- evaluation ------------------------------------------------------------
    cfg.eval = Config()
    cfg.eval.n_rollout_steps = 20  # -1 = full trajectory
    cfg.eval.test = False  # use the test split instead of valid
    cfg.eval.rollout_dir = None

    cfg.eval.train = Config()  # validation-during-training settings
    cfg.eval.train.n_trajs = 50
    cfg.eval.train.metrics_stride = 10
    cfg.eval.train.batch_size = 1
    cfg.eval.train.metrics = ["mse"]
    cfg.eval.train.out_type = "none"  # none | vtk | pkl

    cfg.eval.infer = Config()  # inference/test settings
    cfg.eval.infer.n_trajs = -1
    cfg.eval.infer.metrics_stride = 1
    cfg.eval.infer.batch_size = 2
    cfg.eval.infer.metrics = ["mse", "e_kin", "sinkhorn"]
    cfg.eval.infer.out_type = "pkl"
    cfg.eval.infer.n_extrap_steps = 0

    # -- logging ------------------------------------------------------------
    cfg.logging = Config()
    cfg.logging.log_steps = 1000
    cfg.logging.eval_steps = 10000
    cfg.logging.wandb = False  # wandb not bundled; kept for config compat
    cfg.logging.wandb_project = None
    cfg.logging.wandb_entity = "lagrangebench"
    cfg.logging.ckp_dir = "ckp"
    cfg.logging.run_name = None
    # XLA profiler: write a TensorBoard trace between these steps
    cfg.logging.profile_dir = None
    cfg.logging.profile_steps = [10, 15]

    # -- neighbor list ----------------------------------------------------
    cfg.neighbors = Config()
    # allpairs | celllist | pallas. The pallas kernel is the fastest on TPU
    # for both single-trajectory rollouts and vmapped batches (a custom
    # batching rule folds the whole batch into one kernel launch); celllist
    # is the portable XLA default.
    cfg.neighbors.backend = "celllist"
    cfg.neighbors.multiplier = 1.25  # capacity headroom on the edge buffer
    # edge layout: "dense" (N, K) per-receiver sender matrix — the TPU fast
    # path (scatter-free build + aggregation); "sparse" (2, E) compacted
    # edges — the reference-compatible layout
    cfg.neighbors.format = "dense"
    # dense+pallas only: the NL kernel emits min-imaged, cutoff-normalized
    # edge geometry (rel_disp/rel_dist) alongside sender ids in one
    # combined scatter, and the feature chain skips its sender-position
    # gather (ops/neighbors_pallas.py). Ignored on non-pallas backends.
    cfg.neighbors.emit_geometry = False

    # -- parallelism (new vs reference: ICI data parallelism) -------------
    cfg.parallel = Config()
    cfg.parallel.data = -1  # data-parallel mesh size; -1 = all local devices
    # spatial (particle-axis) sharding for inference: number of x-slabs /
    # devices; 0 = off. gns|painn|segnn|egnn; see parallel/spatial.py
    cfg.parallel.spatial = 0

    return cfg


defaults = set_defaults()


def resolve_backend(backend: str) -> str:
    """Map reference backend aliases to TPU-native backend names.

    ``auto`` picks the Pallas cell-list kernel on TPU (the fast path the
    benchmarks run) and the XLA celllist elsewhere (the Pallas kernel only
    runs in slow interpreter mode off-TPU).
    """
    if backend == "auto":
        import jax

        return "pallas" if jax.default_backend() == "tpu" else "celllist"
    backend = BACKEND_ALIASES.get(backend, backend)
    assert backend in VALID_BACKENDS, (
        f"Unknown neighbors backend {backend!r}; valid: {VALID_BACKENDS} "
        f"(aliases: {sorted(BACKEND_ALIASES)})"
    )
    return backend


def check_cfg(cfg: Config) -> None:
    """Semantic validation (reference lagrangebench/defaults.py:182-204)."""
    assert cfg.mode in ["train", "infer", "all"]
    assert cfg.dtype in ["float32", "float64"]
    assert cfg.dataset.src is not None, "dataset.src must be specified."

    assert cfg.model.input_seq_length >= 2, "At least two positions for one past vel."
    assert int(cfg.train.get("overflow_sync_every", 1)) >= 1

    pf = cfg.train.pushforward
    assert len(pf.steps) == len(pf.unrolls) == len(pf.probs)
    assert all(s >= 0 for s in pf.unrolls), "All unrolls must be non-negative."
    assert all(s >= 0 for s in pf.probs), "All probabilities must be non-negative."
    lwv = list(cfg.train.loss_weight.values())
    assert all(w >= 0 for w in lwv), "All loss weights must be non-negative."
    assert sum(lwv) > 0, "At least one loss weight must be non-zero."

    assert cfg.eval.train.n_trajs >= -1
    assert cfg.eval.infer.n_trajs >= -1
    assert set(cfg.eval.train.metrics).issubset(["mse", "mae", "e_kin", "sinkhorn"])
    assert set(cfg.eval.infer.metrics).issubset(["mse", "mae", "e_kin", "sinkhorn"])
    assert cfg.eval.train.out_type in ["none", "vtk", "pkl"]
    assert cfg.eval.infer.out_type in ["none", "vtk", "pkl"]

    resolve_backend(cfg.neighbors.backend)
    assert cfg.neighbors.format in ["sparse", "dense", "slot"]
