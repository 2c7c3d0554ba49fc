"""High-level predict API: SkyEyeDetector facade + Results container.

Capability parity (reference README.md:39-53, SURVEY.md §2.7#1):
    model = SkyEyeDetector(weights='weights/skyeye_l.pt')
    results = model('path/to/image.jpg')
    results.show(); results.save('outputs/')
The reference class actually takes `cfg` and returns tensors; this facade provides the
declared hub-style API on top of the functional core: one jitted
preprocess->forward->decode->NMS executable per input shape, weights from torch .pt /
orbax dirs / variant names, `.warmup()`, `.model_info()`, and a Results object with
`.show() / .save() / .crop() / .pandas() / .xyxy` accessors.

TPU-native: everything between the raw uint8 frame and the (max_det, 6) detection
array is ONE XLA launch with static shapes — letterbox resample, normalize, backbone,
decode, and NMS never leave the device (BASELINE.json north star).
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelConfig
from .models.head import decode_predictions
from .ops.letterbox import letterbox_params
from .ops.nms import nms_batched, serving_max_nms
from .utils.general import LOGGER, check_img_size
from .utils.visualization import Annotator, colors


class Results:
    """Detection results for a batch of images (hub-style accessors)."""

    def __init__(self, detections: List[np.ndarray], images: List[np.ndarray],
                 paths: List[str], names: Sequence[str], times: Dict[str, float]):
        self.detections = detections  # per image (n, 6) [x1, y1, x2, y2, conf, cls]
        self.images = images          # original BGR frames
        self.paths = paths
        self.names = list(names)
        self.times = times            # ms per stage

    def __len__(self) -> int:
        return len(self.detections)

    @property
    def xyxy(self) -> List[np.ndarray]:
        return self.detections

    @property
    def xywh(self) -> List[np.ndarray]:
        out = []
        for det in self.detections:
            d = det.copy()
            if len(d):
                d[:, 0] = (det[:, 0] + det[:, 2]) / 2
                d[:, 1] = (det[:, 1] + det[:, 3]) / 2
                d[:, 2] = det[:, 2] - det[:, 0]
                d[:, 3] = det[:, 3] - det[:, 1]
            out.append(d)
        return out

    def pandas(self):
        """Per-image pandas DataFrames with named columns."""
        import pandas as pd

        cols = ["xmin", "ymin", "xmax", "ymax", "confidence", "class"]
        frames = []
        for det in self.detections:
            df = pd.DataFrame(det, columns=cols)
            df["name"] = [
                self.names[int(c)] if int(c) < len(self.names) else str(int(c))
                for c in df["class"]
            ]
            frames.append(df)
        return frames

    def _image(self, i: int) -> np.ndarray:
        """Original image i; lazily loaded from its path when the fast file-batch
        path (predict_files) skipped host decoding."""
        if self.images[i] is None:
            import cv2

            im = cv2.imread(self.paths[i])
            if im is None:
                raise FileNotFoundError(self.paths[i])
            self.images[i] = im
        return self.images[i]

    def render(self) -> List[np.ndarray]:
        """Annotated copies of the original images (BGR)."""
        out = []
        for i, det in enumerate(self.detections):
            im = self._image(i)
            ann = Annotator(im.copy())
            for *xyxy, conf, cls in det:
                c = int(cls)
                name = self.names[c] if c < len(self.names) else str(c)
                ann.box_label(xyxy, f"{name} {conf:.2f}", colors(c, True))
            out.append(ann.result())
        return out

    def show(self):
        try:
            import cv2

            for i, im in enumerate(self.render()):
                cv2.imshow(f"skyeye {i}", im)
            cv2.waitKey(0)
        except Exception as e:
            LOGGER.warning("show() unavailable (%s); use save() instead", e)

    def save(self, save_dir: Union[str, Path] = "runs/detect") -> List[Path]:
        import cv2

        save_dir = Path(save_dir)
        save_dir.mkdir(parents=True, exist_ok=True)
        files = []
        for i, im in enumerate(self.render()):
            name = Path(self.paths[i]).name if i < len(self.paths) else f"image{i}.jpg"
            f = save_dir / name
            cv2.imwrite(str(f), im)
            files.append(f)
        LOGGER.info("saved %d annotated images to %s", len(files), save_dir)
        return files

    def crop(self, save_dir: Union[str, Path] = "runs/detect/crops") -> List[np.ndarray]:
        from .utils.visualization import save_one_box

        crops = []
        for i, det in enumerate(self.detections):
            for j, (*xyxy, conf, cls) in enumerate(det):
                name = self.names[int(cls)] if int(cls) < len(self.names) else str(int(cls))
                crops.append(
                    save_one_box(
                        xyxy, self._image(i),
                        file=Path(save_dir) / name / f"{Path(self.paths[i]).stem}_{j}.jpg",
                    )
                )
        return crops

    def print(self):
        for i, det in enumerate(self.detections):
            counts = {}
            for c in det[:, 5].astype(int) if len(det) else []:
                counts[c] = counts.get(c, 0) + 1
            s = ", ".join(
                f"{n} {self.names[c] if c < len(self.names) else c}"
                f"{'s' if n > 1 else ''}"
                for c, n in counts.items()
            )
            LOGGER.info("image %d/%d: %s", i + 1, len(self.detections), s or "no detections")


class SkyEyeDetector:
    """User-facing detector: construct from weights or config, call on images."""

    def __init__(
        self,
        weights: Optional[Union[str, Path]] = None,
        cfg: Union[str, dict, ModelConfig] = "skyeye_s",
        num_classes: Optional[int] = None,
        img_size: int = 640,
        conf_thres: float = 0.25,
        iou_thres: float = 0.45,
        max_det: int = 300,
        dtype: Any = jnp.float32,
        names: Optional[Sequence[str]] = None,
        fuse: bool = True,
        approx_topk: bool = True,
        mesh: Optional[Any] = None,
    ):
        """`approx_topk=True` (serving default) uses jax.lax.approx_max_k for the
        pre-NMS candidate cut — the TPU-native approximate top-k (~95% candidate
        recall vs the exact sort, measured mAP50 delta on chip recorded in
        BASELINE.md). Pass False for exact reference-parity ranking (what
        cli/validate.py uses for mAP eval).

        `mesh`: optional jax.sharding.Mesh with a "data" axis
        (parallel.mesh.create_mesh) — serving scales out SPMD over it: weights
        replicate once, every pipeline runs under shard_map with the batch split
        over the data axis, and each device executes the FULL pipeline (model +
        decode + Pallas NMS) on its local shard with zero collectives. Batches
        are padded to a multiple of the data-axis size inside the executable
        (static shapes; padded rows dropped on return)."""
        from .utils.checkpoint import load_model

        if weights is not None:
            self.module, self.variables, self.config = load_model(
                weights, num_classes=num_classes, dtype=dtype, fuse=fuse
            )
        else:
            from .models.detector import create_detector

            self.module, self.variables = create_detector(
                cfg, num_classes=num_classes, dtype=dtype
            )
            self.config = self.module.config

        self.stride = int(max(self.config.strides))
        self.img_size = check_img_size(img_size, self.stride)
        self.conf_thres = conf_thres
        self.iou_thres = iou_thres
        self.max_det = max_det
        self.approx_topk = approx_topk
        self.names = list(names) if names else [str(i) for i in range(self.config.nc)]
        self.pt = True  # reference detect.py:126 checks model.pt
        self._mesh = mesh
        if mesh is not None:
            from .parallel.mesh import replicated

            self.variables = jax.device_put(self.variables, replicated(mesh))
        self._executables: Dict[Tuple, Any] = {}
        # Compile budget for the fully-on-device letterbox path: each distinct input
        # (H, W) is one compile (minutes through a remote-compile tunnel). Past the
        # budget, images are letterboxed on the HOST into the canonical square and
        # run through the shared canonical executable — no further per-shape
        # compiles. Each executable still re-specializes per power-of-two batch
        # bucket (1/2/4/8/16), so the total compile bound for a mixed-shape folder
        # is (max_compiled_shapes + 1) * |batch buckets touched|, not
        # max_compiled_shapes + 1.
        self.max_compiled_shapes = 4
        self._seen_shapes: set = set()
        # s2d-packed serving stem (ops/packed_stem.py) for the host-letterboxed
        # path: exact weight remap, ~25% e2e throughput on v5e
        self._packed = None
        self._int8_neck = False
        self._bn_fused = weights is not None and fuse

    def quantize_int8(self, calib_images, mode: str = "neck"):
        """Post-training int8 quantization of the serving model.

        mode="neck" (currently the only mode): every FPN/PAN conv runs
        s8×s8→s32 on the TPU's double-rate int8 MXU path with calibrated
        per-tensor activation scales, int8-resident between neck convs
        (ops/int8_neck.py — unit-level 1.28× over bf16 at neck-class shapes,
        profiles/int8_deep_bench.json; accuracy gated at ≤0.5 pt mAP50 by
        tools/int8_serving_gate.py). The backbone/head stay bf16.

        calib_images: a handful (8–32) of representative HWC uint8 RGB
        frames; they are letterboxed to the detector's img_size and drive
        ops/calibrate.observe_ranges. Compiled pipelines are rebuilt lazily
        after quantization.

        Calibrate AT THE SERVING RESOLUTION: ranges observed at a smaller
        size do not transfer — measured on chip @1280 with 320-px
        calibration the P/R operating point shifts hard (P +0.16, R −0.06;
        |Δ mAP50| 1.78 pt, profiles/int8_serving_gate_r5.json). Re-gate on
        your own val split after quantizing (tools/int8_serving_gate.py).
        """
        if mode != "neck":
            raise ValueError(f"unsupported int8 mode: {mode!r} (only 'neck')")
        if self._int8_neck:
            return self
        import numpy as np

        from .ops.calibrate import observe_ranges
        from .ops.int8_neck import quantize_neck_variables
        from .ops.letterbox import letterbox
        from .utils.checkpoint import fuse_conv_bn

        if not self._bn_fused:
            self.variables = fuse_conv_bn(self.variables)
            self._bn_fused = True
        s = self.img_size
        frames = np.stack([
            letterbox(np.asarray(im), (s, s), auto=False)[0]
            for im in calib_images
        ]).astype(np.float32) / 255.0
        # calibrate in small batches: ranges are absmax/percentile scalars
        batches = [frames[i:i + 8] for i in range(0, len(frames), 8)]
        ranges = observe_ranges(self.module, self.variables, batches)
        self.variables = quantize_neck_variables(self.variables, ranges,
                                                 self.config)
        self.module = self.module.clone(int8_neck=True)
        self._int8_neck = True
        if self._mesh is not None:
            from .parallel.mesh import replicated

            self.variables = jax.device_put(self.variables,
                                            replicated(self._mesh))
        self._executables.clear()
        self._packed = None
        return self

    # -- core jitted pipeline ---------------------------------------------------

    def _shard_over_batch(self, body):
        """Serving scale-out: when a mesh is set, run `body` SPMD over the
        mesh's "data" axis via shard_map — each device executes the full
        pipeline (model forward + decode + Pallas NMS kernel) on its local
        batch shard, embarrassingly parallel with zero collectives (custom
        calls can't be GSPMD-partitioned, so shard_map, not sharded jit, is the
        mechanism that keeps the kernel on the per-device path). Identity when
        no mesh is set."""
        mesh = self._mesh
        if mesh is None:
            return body
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        from .parallel.mesh import DATA_AXIS

        n = int(mesh.shape[DATA_AXIS])
        sharded = shard_map(body, mesh=mesh, in_specs=P(DATA_AXIS),
                            out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
                            check_rep=False)

        def run(frames):
            B = frames.shape[0]
            pad = (-B) % n
            if pad:  # static per batch bucket; padded rows dropped below
                frames = jnp.concatenate(
                    [frames,
                     jnp.broadcast_to(frames[:1], (pad,) + frames.shape[1:])])
            det, cnt = sharded(frames)
            return det[:B], cnt[:B]

        return run

    def _pipeline(self, in_shape: Tuple[int, int], out_shape: Tuple[int, int],
                  multi_label: bool, agnostic: bool):
        """Build the single-launch uint8-frame -> detections executable."""
        key = (in_shape, out_shape, multi_label, agnostic)
        if key in self._executables:
            return self._executables[key]

        anchors = jnp.asarray(self.config.anchors)
        module, variables = self.module, self.variables
        conf, iou, max_det = self.conf_thres, self.iou_thres, self.max_det
        approx = self.approx_topk

        def body(frames):  # (B, H0, W0, 3) uint8 RGB
            from .ops.letterbox import letterbox_batch_jax

            x = letterbox_batch_jax(frames, out_shape) / 255.0
            x = x.astype(module.dtype)
            outs = module.apply(variables, x, train=False)
            if approx and not multi_label:
                # serving fast path: candidate cut on raw logits, decode only
                # survivors (ops/late_decode.py) — skips the lane-padded full
                # decode. Exact mode (approx_topk=False) keeps the canonical
                # global-cut ordering for reference parity.
                from .ops.late_decode import late_decode_nms

                return late_decode_nms(
                    outs, anchors, out_shape, conf_thres=conf, iou_thres=iou,
                    agnostic=agnostic, max_det=max_det, max_nms=serving_max_nms(conf),
                    approx_topk=True)
            dec = decode_predictions(outs, anchors, out_shape,
                                     anchor_major=False)
            det, n = nms_batched(
                dec,
                conf_thres=conf, iou_thres=iou, multi_label=multi_label,
                agnostic=agnostic, max_det=max_det,
                max_nms=serving_max_nms(conf), approx_topk=approx,
            )
            return det, n

        run = jax.jit(self._shard_over_batch(body))
        self._executables[key] = run
        return run

    def _packed_model(self):
        if self._packed is None:
            from .models.detector import SkyEyeDetectorModule
            from .ops.packed_csp import pack_stage1_variables
            from .ops.packed_stem import pack_stem_variables

            from .ops.merged_csp import merge_csp_cv12_variables

            # packed stem + packed stage 1 (ops/packed_csp.py) + merged CSP
            # split convs (ops/merged_csp.py): all exact weight remaps; stage 1
            # otherwise pays 2-4x lane-padding HBM waste at C=32/64
            # (profiles/r3_1280), and each CSP's cv1+cv2 otherwise reads its
            # input from HBM twice
            module = SkyEyeDetectorModule(
                config=self.config, dtype=self.module.dtype, packed_stem=True,
                packed_stage1=True, merged_csp=True,
                int8_neck=self._int8_neck,
            )
            pvars = merge_csp_cv12_variables(pack_stage1_variables(
                pack_stem_variables(self.variables, down1_p2p=True)))
            if self._mesh is not None:
                from .parallel.mesh import replicated

                pvars = jax.device_put(pvars, replicated(self._mesh))
            self._packed = (module, pvars)
        return self._packed

    def _pipeline_canonical(self, out_shape: Tuple[int, int], multi_label: bool,
                            agnostic: bool):
        """Executable over host-letterboxed canonical frames: packed uint8
        (B, S/4, S/4, 48) -> detections. One compile serves every input shape."""
        key = ("canonical", out_shape, multi_label, agnostic)
        if key in self._executables:
            return self._executables[key]

        module, variables = self._packed_model()
        anchors = jnp.asarray(self.config.anchors)
        conf, iou, max_det = self.conf_thres, self.iou_thres, self.max_det
        approx = self.approx_topk

        def body(frames):
            x = frames.astype(module.dtype) / 255.0
            outs = module.apply(variables, x, train=False)
            if approx and not multi_label:
                from .ops.late_decode import late_decode_nms

                return late_decode_nms(
                    outs, anchors, out_shape, conf_thres=conf, iou_thres=iou,
                    agnostic=agnostic, max_det=max_det, max_nms=serving_max_nms(conf),
                    approx_topk=True)
            dec = decode_predictions(outs, anchors, out_shape,
                                     anchor_major=False)
            det, n = nms_batched(
                dec,
                conf_thres=conf, iou_thres=iou, multi_label=multi_label,
                agnostic=agnostic, max_det=max_det,
                max_nms=serving_max_nms(conf), approx_topk=approx,
            )
            return det, n

        run = jax.jit(self._shard_over_batch(body))
        self._executables[key] = run
        return run

    @staticmethod
    def _batch_buckets(n: int, cap: int = 16) -> List[int]:
        """Split n items into fixed batch sizes (powers of two up to cap) so batch
        count, like shapes, draws from a small compile-cached set."""
        sizes = []
        while n >= cap:
            sizes.append(cap)
            n -= cap
        b = 1
        while n > 0:
            if n & b:
                sizes.append(b)
                n -= b
            b <<= 1
        return sorted(sizes, reverse=True)

    def warmup(self, imgsz: Tuple[int, int, int, int] = (1, 3, 640, 640)):
        """Compile the pipeline for the given shape (reference model.warmup,
        detect.py:126)."""
        b, _, h, w = imgsz
        frames = jnp.zeros((b, h, w, 3), jnp.uint8)
        run = self._pipeline((h, w), (self.img_size, self.img_size), False, False)
        jax.block_until_ready(run(frames))

    def __call__(self, source, size: Optional[int] = None, multi_label: bool = False,
                 agnostic: bool = False) -> Results:
        """Run detection on image path(s) / numpy array(s) (HWC BGR like cv2)."""
        import time

        imgs, paths = self._load_sources(source)
        out_size = check_img_size(size or self.img_size, self.stride)

        t0 = time.perf_counter()
        # Split by input shape, but only spend device-letterbox compiles on the
        # first max_compiled_shapes distinct shapes; everything else goes through
        # the shared canonical executable via host letterbox (no new compiles).
        groups: Dict[Tuple[int, int], List[int]] = {}
        host_idxs: List[int] = []
        for i, im in enumerate(imgs):
            shape = im.shape[:2]
            if shape in self._seen_shapes or len(self._seen_shapes) < self.max_compiled_shapes:
                self._seen_shapes.add(shape)
                groups.setdefault(shape, []).append(i)
            else:
                host_idxs.append(i)

        detections: List[Optional[np.ndarray]] = [None] * len(imgs)
        t_infer = 0.0

        def _rescale(d, gain, dw, dh, shape):
            if len(d):
                d[:, [0, 2]] = np.clip((d[:, [0, 2]] - dw) / gain, 0, shape[1])
                d[:, [1, 3]] = np.clip((d[:, [1, 3]] - dh) / gain, 0, shape[0])
            return d

        for shape, idxs in groups.items():
            run = self._pipeline(shape, (out_size, out_size), multi_label, agnostic)
            gain, dw, dh = letterbox_params(shape, (out_size, out_size))
            pos = 0
            for bs in self._batch_buckets(len(idxs)):
                chunk = idxs[pos : pos + bs]
                pos += bs
                batch = np.stack([imgs[i][:, :, ::-1] for i in chunk])  # BGR->RGB
                t1 = time.perf_counter()
                det, n = run(jnp.asarray(batch))
                det, n = np.asarray(det), np.asarray(n)
                t_infer += time.perf_counter() - t1
                for k, i in enumerate(chunk):
                    detections[i] = _rescale(det[k, : n[k]].copy(), gain, dw, dh,
                                             shape)

        if host_idxs:
            from .ops.letterbox import letterbox
            from .ops.packed_stem import s2d4_host

            run = self._pipeline_canonical((out_size, out_size), multi_label,
                                           agnostic)
            pos = 0
            for bs in self._batch_buckets(len(host_idxs)):
                chunk = host_idxs[pos : pos + bs]
                pos += bs
                lb, params = [], []
                for i in chunk:
                    im, ratio, (dw, dh) = letterbox(
                        imgs[i][:, :, ::-1], (out_size, out_size), auto=False
                    )
                    lb.append(im)
                    params.append((ratio[0], dw, dh))
                batch = s2d4_host(np.stack(lb))
                t1 = time.perf_counter()
                det, n = run(jnp.asarray(batch))
                det, n = np.asarray(det), np.asarray(n)
                t_infer += time.perf_counter() - t1
                for k, i in enumerate(chunk):
                    gain, dw, dh = params[k]
                    detections[i] = _rescale(det[k, : n[k]].copy(), gain, dw, dh,
                                             imgs[i].shape[:2])
        total = time.perf_counter() - t0
        times = {
            "inference_ms": t_infer / max(len(imgs), 1) * 1000,
            "total_ms": total / max(len(imgs), 1) * 1000,
        }
        return Results(detections, imgs, paths, self.names, times)

    def predict_files(self, paths: Sequence[Union[str, Path]],
                      size: Optional[int] = None, multi_label: bool = False,
                      agnostic: bool = False) -> Results:
        """Throughput path for image FILES: the native C++ thread pool decodes,
        letterboxes, and 4x4 space-to-depth packs the whole batch
        (native/skyeye_prep.cc sp_prep_batch_s2d4) straight into the canonical
        packed-stem executable — no cv2, no per-image Python, no numpy repack.
        Original images are loaded lazily only if .render()/.save()/.crop() ask.

        Falls back to __call__ when the native library is unavailable.
        """
        import time

        from .data.native import native_available

        paths = [str(p) for p in paths]
        if not native_available():
            return self(paths, size=size, multi_label=multi_label,
                        agnostic=agnostic)
        from .data.native import prep_batch_s2d4

        out_size = check_img_size(size or self.img_size, self.stride)
        run = self._pipeline_canonical((out_size, out_size), multi_label, agnostic)

        t0 = time.perf_counter()
        detections: List[Optional[np.ndarray]] = [None] * len(paths)
        t_infer = 0.0
        pos = 0
        for bs in self._batch_buckets(len(paths)):
            chunk = list(range(pos, pos + bs))
            pos += bs
            packed, meta, n_ok = prep_batch_s2d4(
                [paths[i] for i in chunk], out_size
            )
            t1 = time.perf_counter()
            det, n = run(jnp.asarray(packed))
            det, n = np.asarray(det), np.asarray(n)
            t_infer += time.perf_counter() - t1
            for k, i in enumerate(chunk):
                gain, dw, dh = meta[k]
                d = det[k, : n[k]].copy()
                if gain > 0 and len(d):
                    # native shape recovery: letterbox geometry inverts exactly
                    w0 = (out_size - 2 * dw) / gain
                    h0 = (out_size - 2 * dh) / gain
                    d[:, [0, 2]] = np.clip((d[:, [0, 2]] - dw) / gain, 0, w0)
                    d[:, [1, 3]] = np.clip((d[:, [1, 3]] - dh) / gain, 0, h0)
                detections[i] = d if gain > 0 else np.zeros((0, 6), np.float32)
        total = time.perf_counter() - t0
        times = {
            "inference_ms": t_infer / max(len(paths), 1) * 1000,
            "total_ms": total / max(len(paths), 1) * 1000,
        }
        return Results(detections, [None] * len(paths), paths, self.names, times)

    def _load_sources(self, source) -> Tuple[List[np.ndarray], List[str]]:
        items = source if isinstance(source, (list, tuple)) else [source]
        imgs, paths = [], []
        for it in items:
            if isinstance(it, np.ndarray):
                imgs.append(it)
                paths.append(f"array{len(paths)}.jpg")
            else:
                import cv2

                im = cv2.imread(str(it))
                if im is None:
                    raise FileNotFoundError(f"image not found: {it}")
                imgs.append(im)
                paths.append(str(it))
        return imgs, paths

    def model_info(self, img_size: Optional[int] = None):
        from .utils.profiling import model_info

        return model_info(self.module, self.variables, img_size or self.img_size)

    # functional access for advanced users
    def apply(self, x, train: bool = False):
        return self.module.apply(self.variables, x, train=train)
