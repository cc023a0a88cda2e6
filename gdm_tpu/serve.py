"""AOT-compiled serving artifacts: deployment without model code.

The reference deploys by shipping the full training repo plus per-object
``.pth.tar`` checkpoints and re-running ``train_lm.py -state=eval``
(train_lm.py:318-380) — every serving host needs torch, the compiled
extensions, the dataset code, and pays a fresh model build.  The
TPU-native equivalent serializes the *traced inference programs* with
``jax.export`` (StableHLO): an artifact directory holds

  - ``finalize.bin`` — device preprocessing (colour normalise,
    backproject, normals, point gather; data/pipeline.finalize_batch),
  - ``infer.bin``    — KNN pyramid + GeoMatch forward + on-device pose
    fit (eval/infer.run_inference) with the object's trained weights and
    precomputed mesh features baked in as program constants,
  - ``meta.json``    — shapes, dtypes, knobs, provenance.

Loading needs jax only — no flax, no gdm_tpu model code, no checkpoint
plumbing — and executes on every platform the artifact was lowered for
(default: cpu + tpu).  The two stages stay separate on purpose: staged
programs schedule ~3x better than a monolith on TPU and pipeline
through the device queue (CLAUDE.md perf findings).

Artifacts are single-object, mirroring the reference's per-object
checkpoint layout (train_lm.py:461-468).  Expect them to be
weight-sized (the full parameter set is embedded as constants).
"""

from __future__ import annotations

import json
import os
import os.path as osp

_FINALIZE = "finalize.bin"
_INFER = "infer.bin"
_META = "meta.json"

# bump when the artifact contract changes shape
# (2: depth ships as uint16 counts + per-sample scale, round 5)
_FORMAT_VERSION = 2


def raw_input_spec(batch: int, im_size: int, n_sample: int,
                   fill_depth: bool, with_det: bool = True) -> dict:
    """ShapeDtypeStruct spec of the host-loader arrays the finalize
    stage consumes (data/dataset.PoseDataset output layout: depth as
    raw uint16 counts + a per-sample counts-per-metre divisor — half
    the request/H2D bytes of a float plane; a client holding float
    metres quantises with dpt_u16 = round(dpt_m * dpt_scale))."""
    import jax
    import jax.numpy as jnp

    s = {
        "rgb_u8": jax.ShapeDtypeStruct((batch, im_size, im_size, 3),
                                       jnp.uint8),
        "dpt_u16": jax.ShapeDtypeStruct((batch, im_size, im_size),
                                        jnp.uint16),
        "dpt_scale": jax.ShapeDtypeStruct((batch,), jnp.float32),
        "K_crop": jax.ShapeDtypeStruct((batch, 3, 3), jnp.float32),
        "choose": jax.ShapeDtypeStruct((batch, n_sample), jnp.int32),
    }
    if fill_depth:
        s["dpt_filled"] = jax.ShapeDtypeStruct(
            (batch, im_size, im_size), jnp.float32)
    if with_det:
        s["det"] = jax.ShapeDtypeStruct((batch,), jnp.int32)
    return s


def synthetic_raw(spec: dict) -> dict:
    """Zero-information numpy batch for a raw-input spec, with
    non-degenerate depth/intrinsics fills (the finalize stage
    backprojects, dividing by fx/fy; zero K would NaN every point).

    Accepts either the live ShapeDtypeStruct spec (:func:`raw_input_spec`)
    or the serialized ``meta['raw_spec']`` form ({key: [shape, dtype]}),
    so the `cli export-serving` trace init and the serve daemon's warmup
    batch share ONE definition of which keys need non-zero fills."""
    import numpy as np

    raw = {}
    for k, v in spec.items():
        shape, dtype = ((v.shape, v.dtype) if hasattr(v, "shape")
                        else (tuple(v[0]), v[1]))
        raw[k] = np.zeros(shape, np.dtype(str(dtype)))
    for k in ("dpt_m", "dpt_filled"):
        if k in raw:
            raw[k] += np.float32(0.5)
    if "dpt_u16" in raw:                # 5000 counts / 10000 = 0.5 m
        raw["dpt_u16"] += np.uint16(5000)
        raw["dpt_scale"] += np.float32(10000.0)
    if "K_crop" in raw:
        im = raw["rgb_u8"].shape[1] if "rgb_u8" in raw else 256
        raw["K_crop"] += np.asarray(
            [[500.0, 0, im / 2], [0, 500.0, im / 2], [0, 0, 1]],
            raw["K_crop"].dtype)
    return raw


def export_serving_artifact(
    out_dir: str,
    *,
    apply_fn,
    variables: dict,
    mesh_input,
    mesh_feats,
    mesh_xyz,
    raw_spec: dict,
    fill_depth: bool,
    needs_pyramid: bool,
    knn_chunk: int,
    exact_knn: bool,
    refine,
    icp_reject: float,
    platforms=("cpu", "tpu"),
    meta: dict | None = None,
) -> dict:
    """Serialize the finalize + infer programs for one object.

    Args:
      apply_fn / variables: the trained flax apply and
        {"params", "batch_stats"} pytree (baked into the program).
      mesh_input / mesh_feats / mesh_xyz: per-object mesh constants and
        the encode_mesh output (baked).
      raw_spec: ShapeDtypeStruct dict — see :func:`raw_input_spec`.
      fill_depth / needs_pyramid / knn_chunk / exact_knn / refine:
        static inference knobs, recorded in the metadata.
      icp_reject: ICP gate in metres, baked as a constant.
      platforms: lowering targets; artifacts refuse to run elsewhere.
      meta: extra provenance merged into meta.json (object name, ...).

    Returns the metadata dict written to ``meta.json``.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from gdm_tpu.data.pipeline import finalize_batch
    from gdm_tpu.eval.infer import run_inference

    def finalize_fn(raw):
        return finalize_batch(raw, fill_depth=fill_depth)

    def infer_fn(fin):
        return run_inference(
            apply_fn, variables, fin, mesh_input, mesh_feats, mesh_xyz,
            jnp.float32(icp_reject), needs_pyramid=needs_pyramid,
            knn_chunk=knn_chunk, exact_knn=exact_knn, refine=refine)

    platforms = tuple(platforms)
    fin_spec = jax.eval_shape(finalize_fn, raw_spec)
    exp_fin = jexport.export(jax.jit(finalize_fn),
                             platforms=platforms)(raw_spec)
    exp_inf = jexport.export(jax.jit(infer_fn),
                             platforms=platforms)(fin_spec)

    os.makedirs(out_dir, exist_ok=True)
    with open(osp.join(out_dir, _FINALIZE), "wb") as f:
        f.write(exp_fin.serialize())
    with open(osp.join(out_dir, _INFER), "wb") as f:
        f.write(exp_inf.serialize())

    info = {
        "format_version": _FORMAT_VERSION,
        "platforms": list(platforms),
        "jax_version": jax.__version__,
        "raw_spec": {k: [list(v.shape), str(v.dtype)]
                     for k, v in sorted(raw_spec.items())},
        "output": "poses [batch, 3, 4] (world->cam R|t, metres)",
        "fill_depth": bool(fill_depth),
        "needs_pyramid": bool(needs_pyramid),
        "knn_chunk": int(knn_chunk),
        "exact_knn": bool(exact_knn),
        "refine": refine,
        "icp_reject_m": float(icp_reject),
        **(meta or {}),
    }
    with open(osp.join(out_dir, _META), "w") as f:
        json.dump(info, f, indent=1, sort_keys=True)
    return info


class ServingArtifact:
    """A loaded artifact directory.  ``run(raw)`` -> poses [B, 3, 4].

    ``finalize`` and ``infer`` stay separate callables so a serving loop
    can pipeline batches through the device queue exactly like the live
    evaluator does.
    """

    def __init__(self, path: str):
        from jax import export as jexport

        self.path = path
        with open(osp.join(path, _META)) as f:
            self.meta = json.load(f)
        if self.meta.get("format_version", 0) > _FORMAT_VERSION:
            raise ValueError(
                f"artifact format {self.meta['format_version']} is newer "
                f"than this loader ({_FORMAT_VERSION})")
        with open(osp.join(path, _FINALIZE), "rb") as f:
            self._fin = jexport.deserialize(f.read())
        with open(osp.join(path, _INFER), "rb") as f:
            self._inf = jexport.deserialize(f.read())

        # exported programs only lower for the platforms they were
        # exported with; when the process default backend isn't one of
        # them, pin execution to a device of a platform that IS (fail at
        # load with a clear message, not per-request deep in lowering)
        import jax

        self._device = None
        if jax.default_backend() not in self.platforms:
            for p in self.platforms:
                try:
                    self._device = jax.devices(p)[0]
                    break
                except RuntimeError:
                    continue
            if self._device is None:
                raise ValueError(
                    f"artifact {path} was lowered for {self.platforms}; "
                    f"none of those platforms exist here (default "
                    f"backend {jax.default_backend()!r}) — re-export "
                    f"with --platforms including it")

    @property
    def platforms(self):
        return self._inf.platforms

    def _ctx(self):
        import contextlib

        import jax

        return (contextlib.nullcontext() if self._device is None
                else jax.default_device(self._device))

    def finalize(self, raw: dict):
        """Host arrays (see meta['raw_spec']) -> finalized device batch."""
        with self._ctx():
            return self._fin.call(raw)

    def infer(self, fin: dict):
        """Finalized batch -> poses [B, 3, 4]."""
        with self._ctx():
            return self._inf.call(fin)

    def run(self, raw: dict):
        """Convenience: finalize + infer in one call."""
        return self.infer(self.finalize(raw))


def load_artifact(path: str) -> ServingArtifact:
    return ServingArtifact(path)
