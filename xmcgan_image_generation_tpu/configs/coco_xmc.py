"""Default XMC-GAN configuration for COCO-2014.

Hyperparameter surface mirrors the reference config
(`/root/reference/xmcgan/configs/coco_xmc.py:18-92`) so a user of the
reference can bring their config knowledge over unchanged.  TPU-specific
additions are grouped at the bottom (`mesh_*`, `use_pallas`, ...).
"""

import ml_collections


def get_config(config_string: str = "") -> ml_collections.ConfigDict:
  """Default hyperparameters (COCO-2014, 128px).

  ``--config=<file>:test`` (ml_collections config-string syntax) returns
  the small smoke-test configuration instead.
  """
  if config_string == "test":
    return get_test_config()
  if config_string not in ("", "default"):
    raise ValueError(f"Unknown config variant {config_string!r}")
  config = ml_collections.ConfigDict()
  config.seed = 42

  # Evaluation protocol (reference configs/coco_xmc.py:23-24).
  config.eval_num = 30000
  config.eval_avg_num = 3
  config.num_train_steps = -1
  config.log_loss_every_steps = 1000
  config.eval_every_steps = 1000
  config.checkpoint_every_steps = 5000

  # Data (reference configs/coco_xmc.py:30-34).
  config.dataset = "mscoco"
  config.coco_version = "2014"
  config.data_dir = "data/"
  config.return_text = False
  config.return_filename = False

  config.trial = 0  # Dummy knob for repeated runs.
  # Optimization (reference configs/coco_xmc.py:37-45).
  config.beta1 = 0.5
  config.beta2 = 0.999
  config.d_lr = 0.0004
  config.g_lr = 0.0001
  # Optional learning-rate schedule on top of the constant reference
  # rates: "constant" (the reference's behavior), "cosine" or "linear"
  # (linear warmup over lr_warmup_steps, decay to 0 at lr_decay_steps;
  # both counted in outer train steps — engine/state.py stretches the
  # discriminator's schedule by d_step_per_g_step so G and D decay on the
  # same wall-clock).  Non-constant schedules require lr_decay_steps > 0.
  config.lr_schedule = "constant"
  config.lr_warmup_steps = 0
  config.lr_decay_steps = 0
  config.polyak_decay = 0.999
  config.show_num = 64
  config.shuffle_buffer_size = 1000
  config.batch_norm_group_size = -1
  config.dtype = "bfloat16"
  config.train_shuffle = True

  config.image_size = 128
  config.batch_size = 56
  config.eval_batch_size = 56

  # Model (reference configs/coco_xmc.py:52-66).
  config.df_dim = 96
  config.gf_dim = 96
  config.z_dim = 128
  config.num_epochs = 500
  config.model_name = "xmc"
  config.d_step_per_g_step = 2
  config.g_spectral_norm = False
  config.d_spectral_norm = True
  config.architecture = "xmc_net"
  config.gamma_for_g = 15
  config.word_contrastive = True
  config.sentence_contrastive = True
  config.image_contrastive = True
  config.pretrained_image_contrastive = True
  config.cond_size = 16

  # ------------------------------------------------------------------
  # TPU-native knobs (new in this framework).
  # ------------------------------------------------------------------
  # Mesh axis sizes.  data=-1 means "all devices on the data axis".
  config.mesh_data = -1
  config.mesh_model = 1
  # Use Pallas TPU kernels for the fused contrastive / attention ops.
  # Default ON.  Honest single-chip evidence (round-4 variance-aware A/B,
  # BENCH_NOTES): ON leads OFF by ~+1.4% with the same sign at both
  # measured batches (56: 560.7 vs 553.0 img/s; 84: 553.6 vs 545.4) but
  # each gap sits inside the ±2.3% cross-process spread, so on ONE chip
  # the choice is a wash.  The default is justified by the multi-chip
  # design: the sharded dispatch (ops/pallas/word_scores.py via the
  # ambient mesh) gives each device only its rows of the [B, B] score
  # grid, avoiding the per-device B^2*R*L blow-up the XLA formulation's
  # all-gather induces — functionally validated on the 8-device mesh
  # (tests/test_engine.py::TestPallasStep); wall-clock effect needs real
  # multi-chip hardware.
  config.use_pallas = True
  # Ship images uint8 through the host pipeline and normalize on device
  # (bit-identical to the float path — the host resize quantizes through
  # uint8 either way; ops/images.py): 4x less worker IPC + host->HBM
  # transfer, ~1.6x less host CPU per example.
  config.image_uint8 = True
  # Contrastive negative-pool scope: -1 = global batch (the paper's
  # behavior; the sync_match the reference declared but never implemented,
  # reference libml/attention_lib.py:58-59).  >0 = contiguous groups of
  # that many examples, reproducing the reference's de-facto per-device
  # local pools (set to the per-device batch, e.g. 8).  At multi-chip
  # scale this is THE scaling knob: a global pool weak-scales the [B,B]
  # similarity work quadratically and hits an ICI wall by ~64 chips,
  # while a pinned group size keeps every collective constant per device
  # (projected >=73% no-overlap efficiency to a 256-chip v5e pod —
  # BENCH_NOTES "multi-chip scaling, projected").
  config.contrastive_group_size = -1
  # Data source: "tfrecord" reads the reference-compatible TFRecords from
  # data_dir; "synthetic" produces deterministic random batches (smoke/bench).
  config.data_source = "tfrecord"
  # DiffAug-style augmentation: "shift" (pad-reflect + crop, the reference
  # default) or "zoom_crop" (x1.125 zoom + crop) — the knob the reference
  # exposes via gin (reference libml/augmentation.py:25,73).
  config.augment_method = "shift"
  # Pretrained tower checkpoints (empty string => random init, which is what
  # the reference tests use, reference utils/pretrained_model_utils_test.py:28-36).
  config.resnet_ckpt_path = ""
  config.inception_ckpt_path = ""
  # Host data-loading workers (grain).
  config.grain_worker_count = 8
  # Capture a 5-step xprof trace on host 0 early in training.
  config.profile = False
  # Rematerialize residual blocks (activation memory <-> recompute FLOPs).
  config.remat = False
  # With remat on, only rematerialize blocks whose feature maps are at or
  # above this side length (0 = all blocks).  The large scales dominate
  # activation HBM; keeping the small-scale activations avoids their
  # recompute for ~no memory cost.
  config.remat_min_resolution = 0
  # What remat saves at block boundaries: "full" recomputes the whole
  # block in the backward (classic remat — minimum activation memory);
  # "conv" saves every conv/matmul output and recomputes only the
  # elementwise chains between them (BN normalization, relu, modulation).
  # Measured on a v5e at flagship shapes (BENCH_NOTES, round 4): remat of
  # ANY kind is a capacity lever, not a bandwidth one — when activations
  # fit, no remat wins (560.7 vs 512.5 img/s at 128px/batch 56); when
  # blanket remat is forced, "conv" beats "full" by +6.5% and is the
  # policy to pick on small-HBM parts.
  config.remat_policy = "full"
  # Gradient accumulation: each G/D update scans this many microbatches
  # (batch_size must divide evenly) and applies the optimizer once on the
  # averaged gradients.  A capacity knob beyond the reference's surface —
  # live activation memory is one microbatch's — for fitting flagship
  # batches on small-HBM parts or longer unrolls; compose with remat for
  # the deepest savings.  NOT an exact large-batch emulation: the in-batch
  # contrastive negative pools and BatchNorm statistics are
  # microbatch-sized, and spectral-norm power iteration advances once per
  # microbatch (see engine/xmc_gan.py).  Measured on a v5e
  # (measurements/r05/grad_accum, BENCH_NOTES round 5): the capacity
  # claim holds — 128px batch 224 and 256px batch 64 both OOM plain and
  # train accumulated — and the scan is not overhead but a small WIN
  # (+1-2% img/s over the largest plain batch at the same microbatch
  # size: optimizer/EMA/u-update work amortizes over k microbatches).
  config.grad_accum_steps = 1
  # Native-resolution spatial modulation in the generator (mathematically
  # identical to the reference pipeline; far less HBM traffic and FLOPs).
  config.fused_spatial_cond = True
  # Fold each generator upsample into its following 3x3 conv and each
  # discriminator 2x2 average pool into its preceding 3x3 conv
  # (ops/scale_fuse.py): exact factorizations with 2.25x fewer conv FLOPs
  # and no full-resolution intermediate.  Param tree and checkpoints are
  # unchanged; outputs differ from the unfused pipeline only by float
  # re-association of 2-3 kernel-weight additions.  Measured on a v5e
  # (BENCH_NOTES.md): every per-shape microbench wins 1.3-3x and the full
  # 128px batch-56 step drops 258.4 -> 199.4 ms (433.5 -> 561.7
  # images/sec/chip), so the fused pipeline is the default.
  config.scale_fused_convs = True
  # Scale-fused upsample-conv formulation: "phase" (2x2 phase kernels +
  # depth-to-space interleave) or "dilated" (one base-dilated 4x4 conv,
  # no depth-to-space — attacks the ~3.5 GB/step of interleave
  # transposes the round-4 copy census identified as the one standing
  # waste).  Forward semantics and the param tree are identical.
  # Measured same-process A/B on a v5e (tools/upconv_ab.py, flagship
  # 128px b56, 5 interleaved windows each: measurements/r05/
  # upconv_ab.json): dilated 177.65 ms vs phase 186.46 ms (-4.7% step
  # time, IQR <=0.14 both arms), HBM traffic 103.5 vs 112.4 GB/step;
  # at 256px b32 the cut is larger — 335.68 vs 364.84 ms (-8.0%,
  # measurements/r05/upconv_ab_256.json) — so "dilated" is the default
  # at both resolutions.
  config.upconv_method = "dilated"
  # Conv gradient algorithm for the 3x3/stride-1 G/D convs: "xla" keeps
  # XLA's native conv-gradient emitters; "auto" applies the per-shape
  # winner measured on a v5e by tools/convgrad_bench.py (MXU-matmul
  # reformulations, ops/mxu_conv.py).  Forward results and the param tree
  # are identical for every setting.
  config.conv_backward = "xla"
  # Global batches kept resident on the mesh ahead of the step.
  config.prefetch_batches = 2
  return config


def get_test_config() -> ml_collections.ConfigDict:
  """Small configuration for CPU smoke tests.

  Mirrors the reference shrink factors (reference configs/coco_xmc.py:71-88).
  """
  config = get_config()
  config.batch_size = 2
  config.eval_batch_size = 2
  config.eval_num = 2
  config.eval_avg_num = 1
  config.num_train_steps = 2
  config.log_loss_every_steps = 1
  config.eval_every_steps = 1
  config.checkpoint_every_steps = 1
  config.df_dim = 16
  config.gf_dim = 16
  config.z_dim = 8
  # 32px keeps CPU smoke tests fast (the reference test config stays at
  # 128px, which needs minutes per compiled step on a small CPU host).
  config.image_size = 32
  config.show_num = 4
  config.num_epochs = 1
  config.shuffle_buffer_size = 10
  config.data_source = "synthetic"
  config.pretrained_image_contrastive = False
  config.grain_worker_count = 0
  # CPU smoke tests run Pallas in interpret mode, which is much slower
  # than plain XLA; the kernels have their own dedicated tests.
  config.use_pallas = False
  # Keep the test config bit-exact vs the reference transcription: the
  # scale-fused convs differ by float re-association and have their own
  # equivalence tests (tests/test_scale_fuse.py).
  config.scale_fused_convs = False
  return config


def get_hyper(h):
  return h.product([], name="config")
