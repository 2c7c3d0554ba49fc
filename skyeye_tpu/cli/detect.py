"""Detection CLI: inference on images / videos / webcams / streams.

Capability parity (reference /root/reference/skyeye/cli/detect.py:62-275): source
classification (file/URL/webcam/stream), stride-aligned imgsz, warmup, per-image
scale-to-original, per-class count strings, save txt / conf / crops / annotated
images, cv2.imshow streaming, cv2.VideoWriter for videos/streams, speed summary,
and the full ~24-flag argparse surface (detect.py:233-257).

TPU-native: the per-frame hot path is the api.SkyEyeDetector single-launch pipeline
(device-resident letterbox+forward+decode+NMS); the host only annotates and writes.

Usage: python -m skyeye_tpu.cli.detect --weights best/ --source imgs/ --img-size 640
"""
from __future__ import annotations

import argparse
import platform
import time
from pathlib import Path

import numpy as np

from ..utils.general import LOGGER, check_img_size, increment_path
from ..utils.visualization import Annotator, colors, save_one_box


def run(
    weights="skyeye_s",
    source="data/images",
    data=None,
    imgsz=(640, 640),
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    device: str = "",
    view_img: bool = False,
    save_txt: bool = False,
    save_conf: bool = False,
    save_crop: bool = False,
    nosave: bool = False,
    classes=None,
    agnostic_nms: bool = False,
    augment: bool = False,
    visualize: bool = False,
    update: bool = False,
    project="runs/detect",
    name="exp",
    exist_ok: bool = False,
    line_thickness: int = 3,
    hide_labels: bool = False,
    hide_conf: bool = False,
    half: bool = False,
    vid_stride: int = 1,
    exact_nms: bool = False,
):
    import cv2
    import jax
    import jax.numpy as jnp

    from ..api import SkyEyeDetector
    from ..data.loaders import LoadImages, LoadStreams, LoadWebcam
    from ..data.dataset import IMG_FORMATS, VID_FORMATS

    source = str(source)
    save_img = not nosave and not source.endswith(".txt")
    is_file = Path(source).suffix[1:].lower() in (IMG_FORMATS + VID_FORMATS)
    is_url = source.lower().startswith(("rtsp://", "rtmp://", "http://", "https://"))
    webcam = source.isnumeric() or source.endswith(".streams") or (is_url and not is_file)

    save_dir = increment_path(Path(project) / name, exist_ok=exist_ok, mkdir=True)
    (save_dir / "labels").mkdir(parents=True, exist_ok=True) if save_txt else None

    dtype = jnp.bfloat16 if half else jnp.float32
    detector = SkyEyeDetector(
        weights=weights, img_size=max(imgsz), conf_thres=conf_thres,
        iou_thres=iou_thres, max_det=max_det, dtype=dtype,
    )
    stride = detector.stride
    names = detector.names
    if data:
        from ..utils.general import check_dataset

        names = check_dataset(data).names
        detector.names = names
    imgsz = check_img_size(list(imgsz), stride)

    if webcam:
        dataset = LoadStreams(source, img_size=imgsz[0], stride=stride, vid_stride=vid_stride)
        bs = len(dataset)
    elif source.isdigit():
        dataset = LoadWebcam(source, img_size=imgsz[0], stride=stride)
        bs = 1
    else:
        dataset = LoadImages(source, img_size=imgsz[0], stride=stride)
        bs = 1
    vid_path, vid_writer = [None] * bs, [None] * bs

    class_mask = None
    if classes is not None:
        class_mask = np.zeros(detector.config.nc, bool)
        class_mask[np.asarray(classes)] = True

    # One jitted graph for the whole hot path (forward + decode + NMS): eager
    # module.apply would dispatch each op as its own device launch.
    from functools import partial

    from ..models.head import decode_predictions
    from ..ops.nms import nms_batched, serving_max_nms

    anchors_dev = jnp.asarray(detector.config.anchors)
    class_mask_dev = jnp.asarray(class_mask) if class_mask is not None else None

    @partial(jax.jit, static_argnames=("in_h", "in_w"))
    def infer(frames, in_h, in_w):
        x = frames.astype(dtype) / 255.0
        outs = detector.module.apply(detector.variables, x, train=False)
        if not exact_nms:
            # serving default: candidate cut on the RAW head logits + approx
            # top-k, decode only survivors (ops/late_decode.py) — skips both
            # the lane-padded full decode and the exact TPU sort (measured 38%
            # of the pipeline). --exact-nms restores the reference's
            # decode-everything + exact-ranking path.
            from ..ops.late_decode import late_decode_nms

            return late_decode_nms(
                outs, anchors_dev, (in_h, in_w), conf_thres=conf_thres,
                iou_thres=iou_thres, agnostic=agnostic_nms, max_det=max_det,
                max_nms=serving_max_nms(conf_thres), approx_topk=True, class_mask=class_mask_dev)
        dec = decode_predictions(outs, anchors_dev, (in_h, in_w),
                                 anchor_major=False)
        return nms_batched(
            dec, conf_thres=conf_thres, iou_thres=iou_thres,
            multi_label=False, agnostic=agnostic_nms, max_det=max_det,
            max_nms=serving_max_nms(conf_thres), class_mask=class_mask_dev,
            approx_topk=not exact_nms)

    # Double-buffered pipeline (BASELINE config #3 throughput mode): keep up to
    # `pipeline_depth` batches in flight so host decode/annotate overlaps device
    # compute and the per-launch dispatch overhead amortizes. Depth 1 for imshow
    # interactivity, 3 for offline image/video/stream processing.
    from collections import deque

    from ..ops.boxes import scale_boxes

    pipeline_depth = 1 if view_img else 3
    inflight: "deque" = deque()
    seen, dt = 0, [0.0, 0.0]

    def process(path, im0s, vid_cap, s, frame_no, in_shape, det_batch, n_batch,
                infer_ms):
        nonlocal seen
        for i in range(det_batch.shape[0]):
            seen += 1
            if webcam:
                p, im0 = Path(path[i]), im0s[i].copy()
            else:
                p, im0 = Path(path), im0s.copy()
            save_path = str(save_dir / p.name)
            txt_path = str(save_dir / "labels" / p.stem) + (
                "" if dataset.mode == "image" else f"_{frame_no}"
            )

            det = det_batch[i, : n_batch[i]].copy()
            if len(det):
                det[:, :4] = np.asarray(
                    scale_boxes(in_shape, jnp.asarray(det[:, :4]), im0.shape[:2])
                )

            label_str = ""
            for c in np.unique(det[:, 5].astype(int)) if len(det) else []:
                ncount = int((det[:, 5] == c).sum())
                cname = names[c] if c < len(names) else str(c)
                label_str += f"{ncount} {cname}{'s' * (ncount > 1)}, "

            annotator = Annotator(im0, line_width=line_thickness)
            for *xyxy, conf, cls in reversed(det):
                c = int(cls)
                if save_txt:
                    h0, w0 = im0.shape[:2]
                    xywh = [
                        (xyxy[0] + xyxy[2]) / 2 / w0, (xyxy[1] + xyxy[3]) / 2 / h0,
                        (xyxy[2] - xyxy[0]) / w0, (xyxy[3] - xyxy[1]) / h0,
                    ]
                    line = [c, *xywh] + ([conf] if save_conf else [])
                    with open(f"{txt_path}.txt", "a") as f:
                        f.write(" ".join(f"{v:.6g}" for v in line) + "\n")
                if save_img or save_crop or view_img:
                    cname = names[c] if c < len(names) else str(c)
                    label = None if hide_labels else (
                        cname if hide_conf else f"{cname} {conf:.2f}"
                    )
                    annotator.box_label(xyxy, label, color=colors(c, True))
                if save_crop:
                    save_one_box(xyxy, im0s[i] if webcam else im0s,
                                 file=save_dir / "crops" / names[c] / f"{p.stem}.jpg")

            im0 = annotator.result()
            if view_img:
                if platform.system() == "Linux":
                    cv2.namedWindow(str(p), cv2.WINDOW_NORMAL | cv2.WINDOW_KEEPRATIO)
                cv2.imshow(str(p), im0)
                cv2.waitKey(1)

            if save_img:
                if dataset.mode == "image":
                    cv2.imwrite(save_path, im0)
                else:  # video or stream
                    if vid_path[i] != save_path:
                        vid_path[i] = save_path
                        if isinstance(vid_writer[i], cv2.VideoWriter):
                            vid_writer[i].release()
                        if vid_cap:
                            fps = vid_cap.get(cv2.CAP_PROP_FPS)
                            w = int(vid_cap.get(cv2.CAP_PROP_FRAME_WIDTH))
                            h = int(vid_cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
                        else:
                            fps, w, h = 30, im0.shape[1], im0.shape[0]
                        save_path = str(Path(save_path).with_suffix(".mp4"))
                        vid_writer[i] = cv2.VideoWriter(
                            save_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
                        )
                    vid_writer[i].write(im0)

            LOGGER.info("%s%s%.1fms", s if isinstance(s, str) else "",
                        label_str or "(no detections), ", infer_ms)

    def drain_one():
        path, im0s, vid_cap, s, frame_no, in_shape, handles, t_disp = inflight.popleft()
        det_batch = np.asarray(handles[0])  # sync point
        n_batch = np.asarray(handles[1])
        t2 = time.perf_counter()
        dt[1] += t2 - t_disp
        process(path, im0s, vid_cap, s, frame_no, in_shape, det_batch, n_batch,
                (t2 - t_disp) * 1000)

    for path, im, im0s, vid_cap, s in dataset:
        t0 = time.perf_counter()
        # im: letterboxed RGB HWC (single source) or (B, H, W, 3) for streams
        batch = im if im.ndim == 4 else im[None]
        x = jnp.asarray(batch)
        t1 = time.perf_counter()
        dt[0] += t1 - t0

        handles = infer(x, x.shape[1], x.shape[2])  # async dispatch
        frame_no = dataset.count if webcam else getattr(dataset, "frame", 0)
        im0_copy = [f.copy() for f in im0s] if webcam else im0s.copy()
        inflight.append(
            (path, im0_copy, vid_cap, s, frame_no, batch.shape[1:3], handles, t1)
        )
        if len(inflight) >= pipeline_depth:
            drain_one()
    while inflight:
        drain_one()

    for w in vid_writer:
        if isinstance(w, cv2.VideoWriter):
            w.release()

    t = tuple(x / max(seen, 1) * 1000 for x in dt)
    LOGGER.info("Speed: %.1fms pre-process, %.1fms inference+NMS per image at shape "
                "(1, 3, %d, %d)", t[0], t[1], imgsz[0], imgsz[1])
    if save_txt or save_img:
        LOGGER.info("Results saved to %s", save_dir)
    return save_dir


def parse_opt():
    p = argparse.ArgumentParser(description="SkyEye-TPU detection")
    p.add_argument("--weights", type=str, default="skyeye_s")
    p.add_argument("--source", type=str, default="data/images")
    p.add_argument("--data", type=str, default=None, help="dataset yaml (class names)")
    p.add_argument("--imgsz", "--img-size", nargs="+", type=int, default=[640])
    p.add_argument("--conf-thres", type=float, default=0.25)
    p.add_argument("--iou-thres", type=float, default=0.45)
    p.add_argument("--max-det", type=int, default=300)
    p.add_argument("--device", default="")
    p.add_argument("--view-img", action="store_true")
    p.add_argument("--save-txt", action="store_true")
    p.add_argument("--save-conf", action="store_true")
    p.add_argument("--save-crop", action="store_true")
    p.add_argument("--nosave", action="store_true")
    p.add_argument("--classes", nargs="+", type=int)
    p.add_argument("--agnostic-nms", action="store_true")
    p.add_argument("--augment", action="store_true")
    p.add_argument("--visualize", action="store_true")
    p.add_argument("--update", action="store_true")
    p.add_argument("--project", default="runs/detect")
    p.add_argument("--name", default="exp")
    p.add_argument("--exist-ok", action="store_true")
    p.add_argument("--line-thickness", type=int, default=3)
    p.add_argument("--hide-labels", action="store_true")
    p.add_argument("--hide-conf", action="store_true")
    p.add_argument("--half", action="store_true")
    p.add_argument("--vid-stride", type=int, default=1)
    p.add_argument("--exact-nms", action="store_true",
                   help="exact top-k candidate cut instead of the TPU-optimized "
                        "approx_max_k serving default (~95%% candidate recall)")
    opt = p.parse_args()
    opt.imgsz = opt.imgsz * 2 if len(opt.imgsz) == 1 else opt.imgsz
    return opt


def main():
    opt = parse_opt()
    run(**vars(opt))


if __name__ == "__main__":
    main()
