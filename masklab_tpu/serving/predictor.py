"""End-to-end jitted predictor: the deployable inference pipeline.

Replaces the reference's reconstructed serving graph
(load_masklab_inference_model_from_h5, retinamasklab.py:498-643, plus the
visualization/summary heads from road_project/setup/serving.py:17-52):

  uint8 image -> aspect-preserving downsample -> model -> NMS -> trim ->
  per-channel semantic smoothing -> resize -> upsample to original
  resolution -> full-frame mask paste [-> visualization overlay, analytics
  table]

Everything after JPEG decode runs inside ONE jitted XLA program per static
input resolution. JPEG decode/encode happen host-side (cv2/PIL) — the only
part of the reference's in-graph pipeline that stays on host, since XLA has
no image codec; see serving.server for the wire format.
"""
from __future__ import annotations

import collections
import io
import threading
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfiguration
from ..models.instance import trim_instances
from ..models.masklab import MaskLab
from ..ops.resize import resize_bilinear, resize_like
from .postprocess import crop_and_pad_masks, smooth_semantics, upsample_output
from .summary import fused_summary_union
from .visualize import draw_boxes, draw_segmentation


def _downsampled_hw(in_hw, resolution) -> Tuple[int, int]:
    ratio = min(resolution[0] / in_hw[0], resolution[1] / in_hw[1])
    return int(ratio * in_hw[0]), int(ratio * in_hw[1])


class MaskLabPredictor:
    """Holds model variables and jit-compiles the pipeline per input size.

    ``mesh``: optional ``jax.sharding.Mesh`` with a 'data' axis — inference
    batches shard over it (parameters replicated), scaling serving
    throughput over multiple chips. The reference's TF-Serving deployment
    was one GPU per container (serving.py:42-109); here one process serves
    a whole slice. Batches not divisible by the axis size are zero-padded
    up (per-image pipeline: pad rows are dead compute, results exact) and
    the outputs sliced back — which also collapses all micro-batch buckets
    below ``mesh.size`` into one compiled program.
    """

    def __init__(self, model: MaskLab, variables: Dict,
                 config: Optional[ModelConfiguration] = None,
                 visualization: bool = False, mesh=None,
                 max_pipelines: int = 32):
        self.model = model
        self.mesh = mesh
        # checkpoint-restored leaves are host numpy arrays; without an
        # explicit device_put every predict re-uploads the whole
        # parameter tree through the host link (measured: seconds per
        # request over the dev tunnel)
        self.variables = self.place_variables(variables)
        self.config = config or model.config
        self.visualization = visualization
        # LRU: one pipeline per (resolution, mode). Unbounded growth lets
        # clients sweeping arbitrary photo sizes retain every compiled
        # executable forever (each a 20 s-5 min remote compile on the dev
        # tunnel); warm production sizes stay resident via recency.
        self._jitted: 'collections.OrderedDict' = collections.OrderedDict()
        self._jitted_lock = threading.Lock()
        self.max_pipelines = max_pipelines

    def place_variables(self, variables: Dict):
        """Device-put a (host) variable tree with this predictor's
        placement — replicated over the mesh when sharded serving is on.
        Hot-reload (CheckpointWatcher) goes through here too so a swapped
        checkpoint keeps the sharding."""
        if self.mesh is not None:
            from ..parallel import replicate_sharding
            return jax.device_put(variables, replicate_sharding(self.mesh))
        return jax.device_put(variables)

    # ---- pipeline builders ----

    def _pipeline(self, in_hw: Tuple[int, int], mode: str):
        cfg = self.config
        post = cfg.postprocess
        ds_hw = _downsampled_hw(in_hw, post.resolution)
        mesh = self.mesh

        def run(variables, images):
            images = images.astype(jnp.float32)
            down = resize_bilinear(images, ds_hw[0], ds_hw[1],
                                   align_corners=True)
            if mesh is not None:
                # the same trace scope the parallel eval step uses: keys
                # the NMS jit cache per mesh and, in multi-process
                # programs, routes candidate_pool through per-shard
                # certificates (single-process keeps the global
                # certificate, which is deadlock-free there)
                from ..ops.nms import shard_local_nms
                with shard_local_nms(mesh):
                    out = self.model.apply(variables, down)
            else:
                out = self.model.apply(variables, down)
            det_boxes, inst_masks = trim_instances(out['roi_boxes'],
                                                   out['roi_masks'])
            sem = smooth_semantics(out['seg_pred'],
                                   post.smoothing_kernel_sizes,
                                   post.smoothing_weights)
            sem = resize_like(sem, down)
            boxes_up, masks_up, sem_up = upsample_output(
                det_boxes, inst_masks, sem, ds_hw, in_hw)
            if mode in ('visualize', 'summarize'):
                # serving payload: annotated image + analytics only — the
                # big mask tensors stay on device (host transfer through
                # the accelerator link dominates serving latency otherwise).
                # The analytics + class-union overlay come from the fused
                # paste reducer: the [B, K, H, W] pasted tensor is never
                # materialized for multiple consumers.
                summary, union = fused_summary_union(
                    boxes_up, sem_up, masks_up, in_hw,
                    len(post.instance_colors), post.default_road_size)
                if mode == 'summarize':
                    # analytics-only fetch (the TF-Serving client's choice
                    # of outputs, serving.py:192-212): the [B,H,W] image
                    # tensors never cross the device link — KBs per batch
                    # instead of MBs
                    return dict(det_boxes=boxes_up, summarize=summary)
                vis = draw_boxes(images, boxes_up)
                vis = draw_segmentation(vis, union, post.instance_colors,
                                        post.instance_alpha)
                vis = draw_segmentation(vis, sem_up, post.semantic_colors,
                                        post.semantic_alpha)
                return dict(det_boxes=boxes_up, visualize=vis,
                            summarize=summary)
            padded = crop_and_pad_masks(boxes_up, masks_up, in_hw)
            return dict(det_boxes=boxes_up, instance_masks=masks_up,
                        semantic=sem_up.astype(jnp.uint8),
                        padded_masks=(padded > 0.5).astype(jnp.uint8))

        if mesh is not None:
            from jax.sharding import PartitionSpec as P
            from ..parallel import replicate_sharding
            return jax.jit(run, in_shardings=(
                replicate_sharding(mesh),
                jax.sharding.NamedSharding(mesh, P('data'))))
        return jax.jit(run)

    def _get(self, in_hw: Tuple[int, int], mode: str):
        key = (in_hw, mode)
        with self._jitted_lock:
            fn = self._jitted.get(key)
            if fn is not None:
                self._jitted.move_to_end(key)
                return fn
        # building the jit WRAPPER is cheap (compilation happens at first
        # call); doing it outside the lock keeps concurrent request
        # threads from serializing here when the batcher is off
        fn = self._pipeline(in_hw, mode)
        with self._jitted_lock:
            fn = self._jitted.setdefault(key, fn)
            self._jitted.move_to_end(key)
            while len(self._jitted) > self.max_pipelines:
                self._jitted.popitem(last=False)
        return fn

    # ---- public API ----

    def warmup(self, sizes) -> None:
        """Pre-compile the pipeline for a set of static input resolutions
        (the serving analog of the reference's recommended resolution range,
        config.py:15-19 — each bucket compiles once, then serves hot).

        ``sizes`` entries are (h, w) or (h, w, batch, mode) — the latter
        pre-compiles a micro-batching bucket / output-mode combination."""
        import numpy as np
        for entry in sizes:
            h, w = entry[0], entry[1]
            batch = entry[2] if len(entry) > 2 else 1
            mode = entry[3] if len(entry) > 3 else None
            dummy = np.zeros((batch, h, w, 3), np.uint8)
            self.predict(dummy, mode)

    def predict(self, images: np.ndarray,
                mode: Optional[str] = None) -> Dict[str, np.ndarray]:
        """images: uint8 [H,W,3] or [B,H,W,3] RGB -> numpy outputs.

        ``mode``: 'visualize' (overlay + analytics), 'summarize'
        (analytics only — image tensors never leave the device), or 'raw'
        (boxes/masks/semantics). Defaults to the constructor's
        ``visualization`` flag.
        """
        if mode is None:
            mode = 'visualize' if self.visualization else 'raw'
        if images.ndim == 3:
            images = images[None]
        b = images.shape[0]
        padded = self.mesh is not None and b % self.mesh.shape['data'] != 0
        if padded:
            pad = -b % self.mesh.shape['data']
            images = np.concatenate(
                [images, np.zeros((pad,) + images.shape[1:],
                                  images.dtype)], axis=0)
        in_hw = (images.shape[1], images.shape[2])
        out = self._get(in_hw, mode)(self.variables, jnp.asarray(images))
        if padded:
            # slice ON DEVICE: pad rows must never cross the device link
            # (host transfer dominates serving latency — see __init__)
            return {k: np.asarray(v[:b]) for k, v in out.items()}
        return {k: np.asarray(v) for k, v in out.items()}

    def predict_bytes(self, content: bytes,
                      mode: Optional[str] = None) -> Dict[str, np.ndarray]:
        """JPEG/PNG bytes -> outputs (host-side decode, device pipeline)."""
        return self.predict(decode_image_bytes(content), mode)

    @staticmethod
    def encode_jpeg(image_rgb: np.ndarray) -> bytes:
        import cv2
        ok, buf = cv2.imencode(
            '.jpg', cv2.cvtColor(image_rgb, cv2.COLOR_RGB2BGR))
        if not ok:
            raise RuntimeError('jpeg encode failed')
        return bytes(buf.tobytes())


def decode_image_bytes(content: bytes) -> np.ndarray:
    """JPEG/PNG bytes -> uint8 RGB [H,W,3] (host-side cv2 decode)."""
    import cv2
    arr = np.frombuffer(content, np.uint8)
    bgr = cv2.imdecode(arr, cv2.IMREAD_COLOR)
    if bgr is None:
        # surface a clear client error instead of cv2.cvtColor's
        # opaque !_src.empty() assertion
        raise ValueError('could not decode image bytes '
                         '(corrupt or unsupported format)')
    return cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)


def summary_to_records(summary_row: np.ndarray, instance_labels,
                       crack_label: str = 'crack'):
    """[K, 11] analytics rows -> list of dicts (the gRPC client's DataFrame
    columns, serving.py:192-212)."""
    names = list(instance_labels) + [crack_label]
    records = []
    for row in summary_row:
        cls = int(row[0])
        if cls < 0 or row[5] <= 0:
            continue
        records.append({
            'name': names[cls] if cls < len(names) else str(cls),
            'x': float(row[1]), 'y': float(row[2]),
            'w': float(row[3]), 'h': float(row[4]),
            'confidence': float(row[5]),
            'pixelSize': float(row[6]),
            'estimatedSize': float(row[7]),
            'estimatedHorizontalLength': float(row[8]),
            'estimatedVerticalLength': float(row[9]),
            'includeMyRoad': bool(row[10] > 0.5),
        })
    return records
