"""Profiling: device-synchronized timing, per-module benchmarks, model summaries.

Capability parity (reference /root/reference/skyeye/utils/torch_utils.py):
  time_sync   <- cuda-synchronized timer (:109-118) — here `block_until_ready`
  profile     <- params / GFLOPs / memory / latency micro-benchmark (:121-179) —
                 FLOPs come from XLA's own cost analysis instead of thop
  model_info  <- layer/param counts + GFLOPs at img_size (:226-259)
  scale_img   <- ratio-resize + pad of an image batch (:262-288)
  copy_attr   <- attribute copy helper (:291-305)
Also `jax.profiler` trace capture for TPU timeline analysis (SURVEY.md §5.1).
"""
from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .general import LOGGER


def time_sync() -> float:
    """Wall time after all device work completes (reference time_sync semantics)."""
    (jnp.zeros(()) + 0).block_until_ready()
    return time.time()


def bench_fn(fn: Callable, *args, n: int = 10, warmup: int = 2) -> float:
    """Median seconds per call, synchronized."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def flops_of(fn: Callable, *args) -> Optional[float]:
    """FLOP count from XLA cost analysis (replaces thop)."""
    try:
        lowered = jax.jit(fn).lower(*args)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0] if analysis else {}
        return float(analysis.get("flops", 0.0)) or None
    except Exception as e:
        LOGGER.debug("cost analysis failed: %s", e)
        return None


def flops_by_trace(fn: Callable, *args) -> Optional[float]:
    """Analytic conv/dot FLOP count from the traced jaxpr (no compile — safe to
    call with a slow remote-compile backend; matches XLA cost analysis on the
    matmul/conv terms, which dominate detector forwards)."""
    import numpy as np

    try:
        jaxpr = jax.make_jaxpr(fn)(*args).jaxpr
    except Exception as e:
        LOGGER.debug("trace for FLOP count failed: %s", e)
        return None

    total = 0.0

    def walk(jx):
        nonlocal total
        for eqn in jx.eqns:
            prim = eqn.primitive.name
            if prim == "conv_general_dilated":
                out = eqn.outvars[0].aval
                rhs = eqn.invars[1].aval
                dn = eqn.params["dimension_numbers"]
                fgc = eqn.params.get("feature_group_count", 1)
                cin_g = rhs.shape[dn.rhs_spec[1]]
                cout = rhs.shape[dn.rhs_spec[0]]
                spatial_out = int(np.prod([out.shape[d] for d in dn.out_spec[2:]]))
                batch = out.shape[dn.out_spec[0]]
                k_sp = int(np.prod([rhs.shape[d] for d in dn.rhs_spec[2:]]))
                total += 2.0 * batch * spatial_out * cout * cin_g * k_sp
            elif prim == "dot_general":
                lhs, rhs = (v.aval for v in eqn.invars[:2])
                (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
                m = int(np.prod([d for i, d in enumerate(lhs.shape)
                                 if i not in set(lc) | set(lb)]))
                k = int(np.prod([lhs.shape[i] for i in lc]))
                n = int(np.prod([d for i, d in enumerate(rhs.shape)
                                 if i not in set(rc) | set(rb)]))
                b = int(np.prod([lhs.shape[i] for i in lb]))
                total += 2.0 * b * m * n * k
            for sub in eqn.params.values():
                if hasattr(sub, "jaxpr"):
                    walk(sub.jaxpr)
                elif isinstance(sub, (list, tuple)):
                    for t in sub:
                        if hasattr(t, "jaxpr"):
                            walk(t.jaxpr)

    walk(jaxpr)
    return total or None


def count_params(params) -> int:
    return sum(int(np.prod(np.shape(p))) for p in jax.tree_util.tree_leaves(params))


def profile(inputs, ops: Sequence, n: int = 10, device=None) -> list:
    """Micro-benchmark ops (callables or flax (module, variables) pairs) over inputs.
    Prints Params / GFLOPs / fwd-ms per op (reference profile, torch_utils.py:121-179).
    """
    results = []
    inputs = inputs if isinstance(inputs, (list, tuple)) else [inputs]
    LOGGER.info(f"{'Params':>12}{'GFLOPs':>10}{'fwd (ms)':>10}  op")
    for x in inputs:
        x = jnp.asarray(x)
        for op in ops:
            if isinstance(op, tuple):
                module, variables = op
                fn = lambda a: module.apply(variables, a)
                n_p = count_params(variables.get("params", variables))
                name = type(module).__name__
            else:
                fn, n_p, name = op, 0, getattr(op, "__name__", str(op))
            try:
                jfn = jax.jit(fn)
                dt = bench_fn(jfn, x, n=n) * 1000
                gf = flops_of(fn, x)
                gf_s = f"{gf / 1e9:.2f}" if gf else "-"
                LOGGER.info(f"{n_p:>12}{gf_s:>10}{dt:>10.2f}  {name}")
                results.append({"name": name, "params": n_p, "gflops": gf, "ms": dt})
            except Exception as e:
                LOGGER.warning("profile failed for %s: %s", name, e)
                results.append({"name": name, "error": str(e)})
    return results


def model_info(module, variables, img_size: int = 640, verbose: bool = False) -> Dict:
    """Model summary: params, layers, GFLOPs at img_size (torch_utils.py:226-259)."""
    params = variables["params"]
    n_p = count_params(params)
    n_layers = len(jax.tree_util.tree_leaves(params))

    def fwd(x):
        return module.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            x, train=False,
        )

    x = jnp.zeros((1, img_size, img_size, 3))
    gflops = flops_of(fwd, x)
    info = {
        "layers": n_layers,
        "parameters": n_p,
        "gflops": (gflops / 1e9) if gflops else None,
        "img_size": img_size,
    }
    gf = f"{info['gflops']:.1f}" if info["gflops"] else "?"
    LOGGER.info(
        "Model summary: %d param tensors, %s parameters, %s GFLOPs at %dpx",
        n_layers, f"{n_p:,}", gf, img_size,
    )
    if verbose:
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
            name = "/".join(getattr(k, "key", str(k)) for k in path)
            LOGGER.info("%60s %20s", name, np.shape(leaf))
    return info


def scale_img(img: jnp.ndarray, ratio: float = 1.0, same_shape: bool = False,
              gs: int = 32) -> jnp.ndarray:
    """Ratio-scale an NHWC batch, padding to gs multiples with gray 114/255."""
    if ratio == 1.0:
        return img
    b, h, w, c = img.shape
    new_h, new_w = int(h * ratio), int(w * ratio)
    img = jax.image.resize(img, (b, new_h, new_w, c), method="bilinear")
    if not same_shape:
        h_out = int(np.ceil(h * ratio / gs) * gs)
        w_out = int(np.ceil(w * ratio / gs) * gs)
    else:
        h_out, w_out = h, w
    pad_h, pad_w = max(h_out - new_h, 0), max(w_out - new_w, 0)
    img = jnp.pad(img, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                  constant_values=0.447)
    return img[:, :h_out, :w_out]


def copy_attr(a, b, include=(), exclude=()):
    """Copy attributes from b to a (reference copy_attr, torch_utils.py:291-305)."""
    for k, v in b.__dict__.items():
        if (include and k not in include) or k.startswith("_") or k in exclude:
            continue
        setattr(a, k, v)


@contextmanager
def trace(log_dir: str = "/tmp/skyeye_trace"):
    """Capture a jax.profiler trace for TPU timeline analysis (SURVEY.md §5.1)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        LOGGER.info("profiler trace written to %s", log_dir)


def select_device(device: str = "") -> Any:
    """Device selection by string: '' (default), 'cpu', 'tpu', 'tpu:N'
    (reference select_device, torch_utils.py:70-106)."""
    if not device:
        return jax.devices()[0]
    if ":" in device:
        plat, idx = device.split(":")
        return jax.devices(plat)[int(idx)]
    return jax.devices(device)[0]
