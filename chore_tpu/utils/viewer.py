"""Debug visualization during fitting.

Equivalent of the reference's MeshViewer/cv2 debug loops
(reference: recon/recon_fit_base.py:442-511,749-845 -- live windows showing
the SMPL/object meshes and generated point clouds each optimization stage).
TPU-appropriate design: the fitter's phases run as on-device while_loops,
so per-iteration host rendering would serialize the device; instead the
monitor snapshots AFTER each stage (encode / point clouds / SMPL fit /
object fit), which is what the reference's viewer effectively shows between
its phases too.

Two sinks, both optional:
  * disk: numbered jpgs + a losses.jsonl under ``outdir`` (works headless,
    the normal mode on TPU pods);
  * live cv2 windows when a display is available and ``interactive=True``
    (the reference behavior).
"""
from __future__ import annotations

import json
import os

import numpy as np


class FitMonitor:
    """Stage-by-stage visual monitor for ReconFitter.

    Usage:
        mon = FitMonitor("debug_out", interactive=False)
        fitter.fit_batch(..., monitor=mon)

    Each snapshot renders front + side views of the current meshes/point
    clouds with utils.render.render_meshes and writes
    ``{outdir}/{seq:02d}_{stage}.jpg``; scalars append to losses.jsonl.
    """

    SMPL_COLOR = (0.2, 0.7, 0.3)
    OBJ_COLOR = (0.8, 0.3, 0.2)
    PC_COLORS = {"human": (0.4, 0.9, 0.9), "object": (0.9, 0.8, 0.3)}

    def __init__(self, outdir=None, interactive=False, image_size=512,
                 point_radius=0.006):
        self.outdir = outdir
        self.image_size = image_size
        self.point_radius = point_radius
        self.seq = 0
        self.interactive = interactive and self._display_ok()
        if outdir:
            os.makedirs(outdir, exist_ok=True)

    @staticmethod
    def _display_ok():
        if not os.environ.get("DISPLAY"):
            return False
        try:
            import cv2

            cv2.namedWindow("chore_tpu", cv2.WINDOW_NORMAL)
            cv2.destroyWindow("chore_tpu")
            return True
        except Exception:
            return False

    # ------------------------------------------------------------------ #
    def _point_mesh(self, points):
        """Tiny octahedron per point: renders clouds through the same mesh
        rasterizer (the reference draws point spheres in MeshViewer)."""
        r = self.point_radius
        offs = np.array([[r, 0, 0], [-r, 0, 0], [0, r, 0], [0, -r, 0],
                         [0, 0, r], [0, 0, -r]], np.float32)
        tris = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                         [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]],
                        np.int32)
        pts = np.asarray(points, np.float32)
        verts = (pts[:, None] + offs[None]).reshape(-1, 3)
        faces = (tris[None] + 6 * np.arange(len(pts))[:, None, None]
                 ).reshape(-1, 3)
        return verts, faces.astype(np.int32)

    def snapshot(self, stage, meshes=None, pclouds=None, losses=None,
                 max_points=800):
        """Render and persist/show the current state.

        Args:
          stage: name, e.g. 'pclouds', 'smpl', 'object:joint'.
          meshes: list of (verts, faces, color) in camera space.
          pclouds: dict name -> (N, 3) points (subsampled to max_points).
          losses: dict of scalars for losses.jsonl.
        """
        from chore_tpu.utils.render import look_at_side, render_meshes

        mesh_list, colors = [], []
        for v, f, c in (meshes or []):
            mesh_list.append((np.asarray(v), np.asarray(f)))
            colors.append(c)
        for name, pts in (pclouds or {}).items():
            pts = np.asarray(pts)
            if len(pts) > max_points:
                pts = pts[:: max(1, len(pts) // max_points)]
            mesh_list.append(self._point_mesh(pts))
            colors.append(self.PC_COLORS.get(name, (0.8, 0.8, 0.8)))
        if not mesh_list:
            return None

        front, _ = render_meshes(mesh_list, colors,
                                 image_size=self.image_size)
        allv = np.concatenate([v for v, _ in mesh_list], 0)
        center = allv.mean(0)
        side_list = [(look_at_side(v, 90.0, center), f)
                     for v, f in mesh_list]
        side, _ = render_meshes(side_list, colors,
                                image_size=self.image_size)
        frame = np.concatenate([front, side], axis=1)
        frame8 = (np.clip(frame, 0, 1) * 255).astype(np.uint8)

        if self.outdir:
            import cv2

            path = os.path.join(self.outdir,
                                f"{self.seq:02d}_{stage.replace(':', '_')}.jpg")
            cv2.imwrite(path, frame8[..., ::-1])
            if losses:
                with open(os.path.join(self.outdir, "losses.jsonl"), "a") as f:
                    f.write(json.dumps(
                        {"seq": self.seq, "stage": stage,
                         **{k: float(v) for k, v in losses.items()}}) + "\n")
        if self.interactive:
            import cv2

            cv2.imshow("chore_tpu fit", frame8[..., ::-1])
            cv2.waitKey(1)
        self.seq += 1
        return frame8
