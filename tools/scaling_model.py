"""Analytic multi-chip scaling projection for the flagship train step.

Multi-chip hardware is not reachable from this box (ROADMAP item 2), but
the two inputs a first-order scaling projection needs ARE measurable
here:

1. **Per-device compute time** — measured on the real chip
   (measurements/r05/bench_dilated.json: 190.4 ms/step at 8 img/device,
   d_step 2), constant under weak scaling because per-device shapes are
   constant.
2. **Per-device collective traffic as a function of chip count** — the
   GSPMD-partitioned program is censused (parallel/introspect
   .collective_bytes) after AOT-compiling the FULL flagship-128 step at
   several device counts on the virtual CPU mesh (the same lowering the
   driver dry run validates every round), and each collective kind's
   per-device output bytes are fitted as ``a + b*n``: gradient
   all-reduces are constant in ``n``; the contrastive global-pool
   gathers grow linearly with the global batch.

Those are combined with a v5e ICI hardware model (2D torus, 4 links x
45 GB/s one-way per chip => 180 GB/s egress; scaling-book ring
collectives: an all-reduce of V per-device bytes moves ~2*V*(n-1)/n
over the wire, an all-gather of a V-byte global result moves
~V*(n-1)/n) into step-time BOUNDS per chip count:

  no overlap:   t = t_compute + t_ici
  full overlap: t = max(t_compute, t_ici)

XLA:TPU overlaps the gradient all-reduce with the tail of the backward
pass, so the real machine sits between the bounds, near the full-overlap
one while t_ici << t_compute.

This is a MODEL, not a measurement: it prices ICI serialization only
(no DCN, no host effects, no compiler-schedule changes at other device
counts), and under weak scaling the global contrastive pool GROWS with
the chip count — a semantics change vs the measured batch-56 flagship
(``contrastive_group_size`` freezes the pool; the ``--grouped`` variant
censuses that configuration too).  First job on real multi-chip
hardware: replace this table with measured points (ROADMAP item 2).

Usage:
  python tools/scaling_model.py [--variant {128,256}] [--devices 2,4,8]
      [--project 8,16,32,64,256] [--grouped]
      [--out measurements/r05/scaling_model.json]
"""

import argparse
import json
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

# --- Hardware model: TPU v5e (the measured chip) -------------------------
# 2D torus, 4 ICI links/chip, ~45 GB/s one-way each => per-chip egress.
V5E_ICI_EGRESS_GBPS = 4 * 45.0
# Measured single-chip flagship steps, no collectives:
#  - 128px: 112 images (batch 56, d_step 2) in 190.4 ms
#    (bench_dilated.json, windowed bench);
#  - 256px: 64 images (batch 32, d_step 2) in 335.7 ms
#    (upconv_ab_256.json "dilated", scan-timed).
MEASURED = {
    "128": {"per_device_batch": 56, "compute_ms": 190.4},
    "256": {"per_device_batch": 32, "compute_ms": 335.7},
}


def fit_linear(ns, ys):
  """Least-squares fit y = a + b*n.  Returns (a, b)."""
  k = len(ns)
  sn = sum(ns)
  sy = sum(ys)
  snn = sum(n * n for n in ns)
  sny = sum(n * y for n, y in zip(ns, ys))
  den = k * snn - sn * sn
  if den == 0:
    return sy / k, 0.0
  b = (k * sny - sn * sy) / den
  a = (sy - b * sn) / k
  return a, b


# Wire traffic per device as a multiple of the censused per-device OUTPUT
# bytes, for ring/torus algorithms (scaling book): all-reduce =
# reduce-scatter + all-gather of the same tensor => 2x; gather-shaped
# collectives move the result minus the local shard => (n-1)/n ~ 1x;
# a permute sends exactly its output once.
_WIRE_FACTOR = {
    "all-reduce": 2.0,
    "all-gather": 1.0,
    "all-to-all": 1.0,
    "reduce-scatter": 1.0,
    "collective-permute": 1.0,
}


def ici_ms(bytes_by_kind, n, egress_gbps=V5E_ICI_EGRESS_GBPS):
  """Serialized ICI milliseconds for one step's collectives on n chips."""
  total = 0.0
  ring = (n - 1) / n
  for kind, v in bytes_by_kind.items():
    f = _WIRE_FACTOR.get(kind, 1.0)
    scale = ring if kind != "collective-permute" else 1.0
    total += f * scale * v
  return total / (egress_gbps * 1e9) * 1e3


def project(fits, compute_ms, ns, egress_gbps=V5E_ICI_EGRESS_GBPS,
            images_per_device_step=16.0):
  """Step-time bounds and efficiency per projected chip count."""
  rows = []
  for n in ns:
    bytes_by_kind = {
        kind: max(0.0, a + b * n) for kind, (a, b) in fits.items()
    }
    t_ici = ici_ms(bytes_by_kind, n, egress_gbps)
    no_overlap = compute_ms + t_ici
    full_overlap = max(compute_ms, t_ici)
    rows.append({
        "n_chips": n,
        "collective_mb_per_device": round(
            sum(bytes_by_kind.values()) / 1e6, 1),
        "ici_ms_serialized": round(t_ici, 2),
        "step_ms_bounds": [round(full_overlap, 1), round(no_overlap, 1)],
        "img_per_sec_per_chip_bounds": [
            round(images_per_device_step / no_overlap * 1e3, 1),
            round(images_per_device_step / full_overlap * 1e3, 1),
        ],
        "scaling_efficiency_bounds": [
            round(compute_ms / no_overlap, 4),
            round(compute_ms / full_overlap, 4),
        ],
    })
  return rows


def census_bytes(n_devices, per_device_batch=56, grouped=False,
                 variant="128"):
  """Compile the flagship variant at ``n_devices``; census collective bytes."""
  from xmcgan_image_generation_tpu.parallel import audit
  from xmcgan_image_generation_tpu.parallel.introspect import collective_bytes

  config = audit.flagship_config(variant, n_devices)
  # Weak scaling at the MEASURED single-chip density (56 img/chip,
  # bench_dilated.json), not the audit's 8/device, so the measured
  # compute time applies to the projection unscaled.
  config.batch_size = per_device_batch * n_devices
  if grouped:
    # Freeze the contrastive negative pool at the measured flagship's
    # per-device batch so loss semantics do not change with chip count.
    config.contrastive_group_size = per_device_batch
  text = audit.lowered_step(config, n_devices).compile().as_text()
  return collective_bytes(text)


def build_record(points, project_ns, compute_ms, images_per_device_step):
  """Fits per-kind byte growth from censused points and projects."""
  ns = sorted(points)
  kinds = sorted({k for p in points.values() for k in p})
  fits = {}
  for kind in kinds:
    ys = [float(points[n].get(kind, 0)) for n in ns]
    fits[kind] = fit_linear(ns, ys)
  return {
      "censused_points": {
          str(n): {k: round(v / 1e6, 2) for k, v in sorted(points[n].items())}
          for n in ns
      },
      "per_kind_fit_mb": {
          k: {"const": round(a / 1e6, 2), "per_chip": round(b / 1e6, 3)}
          for k, (a, b) in fits.items()
      },
      "projection": project(fits, compute_ms, project_ns,
                            images_per_device_step=images_per_device_step),
  }


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--devices", default="2,4,8",
                 help="device counts to census (AOT compiles)")
  p.add_argument("--project", default="8,16,32,64,256",
                 help="chip counts to project")
  p.add_argument("--grouped", action="store_true",
                 help="also census the frozen-pool (contrastive_group_size) "
                      "variant at each device count")
  p.add_argument("--variant", default="128", choices=("128", "256"),
                 help="flagship config to project")
  p.add_argument("--per_device_batch", type=int, default=None,
                 help="weak-scaling density (default: the measured "
                      "single-chip batch of the variant)")
  p.add_argument("--out", default=None)
  args = p.parse_args()

  sys.path.insert(0, __file__.rsplit("/", 2)[0])
  import jax

  jax.config.update("jax_platforms", "cpu")
  jax.config.update("jax_compilation_cache_dir", "/tmp/jax_census_cache")
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

  census_ns = [int(x) for x in args.devices.split(",")]
  project_ns = [int(x) for x in args.project.split(",")]

  # Compute time at the chosen weak-scaling density, from the measured
  # single-chip record of the variant (compute scales ~linearly with
  # batch at these MXU-saturating shapes; exact at the default batch).
  meas = MEASURED[args.variant]
  pdb = args.per_device_batch or meas["per_device_batch"]
  d_steps = 2
  images_per_device_step = pdb * d_steps
  compute_ms = (meas["compute_ms"] * images_per_device_step
                / (meas["per_device_batch"] * d_steps))

  variants = {"global_pool": False}
  if args.grouped:
    variants["grouped_pool"] = True

  record = {
      "model": "first-order ICI serialization on a v5e 2D torus "
               "(4x45 GB/s egress/chip); weak scaling at "
               f"{pdb} img/device; compute time from the "
               "measured single-chip step (see MEASURED in this tool)",
      "variant": args.variant,
      "per_device_batch": pdb,
      "compute_ms_per_device": round(compute_ms, 2),
      "ici_egress_gbps_per_chip": V5E_ICI_EGRESS_GBPS,
      "caveats": [
          "analytic projection, NOT a measurement — replace with measured "
          "points the moment multi-chip hardware exists (ROADMAP item 2)",
          "prices ICI serialization only: no DCN, no host effects, no "
          "compiler-schedule drift across device counts",
          "global_pool weak scaling grows the contrastive negative pool "
          "with the global batch (a semantics change vs the measured "
          "single-chip flagship); grouped_pool freezes it via "
          "contrastive_group_size",
      ],
  }
  for name, grouped in variants.items():
    points = {}
    for n in census_ns:
      print(f"[census] flagship-{args.variant} @{n}dev x{pdb} "
            f"{name} ...", file=sys.stderr, flush=True)
      points[n] = census_bytes(n, per_device_batch=pdb, grouped=grouped,
                               variant=args.variant)
      mb = {k: round(v / 1e6, 1) for k, v in sorted(points[n].items())}
      print(f"[census]   {mb}", file=sys.stderr, flush=True)
    record[name] = build_record(points, project_ns, compute_ms,
                                images_per_device_step)

  print(json.dumps(record, indent=1))
  if args.out:
    with open(args.out, "w") as f:
      json.dump(record, f, indent=1)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
  main()
