"""2D wireframe graph container (the HAWP json data contract).

Parity target: reference code/utils/hawp_util.py:7-94 /
code/datasets/utils/wireframe.py — vertices + confidences + weighted edges
with frame size, json round-trip, thresholded line-segment extraction and
rescaling. numpy-based (consumed at dataset-construction time, never traced).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import numpy as np


@dataclass
class WireframeGraph:
    vertices: np.ndarray  # (V, 2) float32, (x, y)
    v_confidences: np.ndarray  # (V,)
    edges: np.ndarray  # (E, 2) int
    weights: np.ndarray  # (E,)
    frame_width: int
    frame_height: int

    @classmethod
    def load_json(cls, fname) -> "WireframeGraph":
        with open(fname, "r") as f:
            data = json.load(f)
        return cls(
            vertices=np.asarray(data["vertices"], dtype=np.float32).reshape(-1, 2),
            v_confidences=np.asarray(data["vertices-score"], dtype=np.float32).reshape(-1),
            edges=np.asarray(data["edges"], dtype=np.int64).reshape(-1, 2),
            weights=np.asarray(data["edges-weights"], dtype=np.float32).reshape(-1),
            frame_width=int(data["width"]),
            frame_height=int(data["height"]),
        )

    @property
    def num_vertices(self) -> int:
        return self.vertices.shape[0]

    @property
    def num_edges(self) -> int:
        return self.edges.shape[0]

    def line_segments(self, threshold: float = 0.05) -> np.ndarray:
        """(L, 5) [x1 y1 x2 y2 score] for edges above the weight threshold
        (reference hawp_util.py:57-69)."""
        keep = self.weights > threshold
        p1 = self.vertices[self.edges[keep, 0]]
        p2 = self.vertices[self.edges[keep, 1]]
        return np.concatenate([p1, p2, self.weights[keep, None]], axis=-1).astype(
            np.float32
        )

    def rescale(self, image_width: int, image_height: int) -> None:
        sx = float(image_width) / float(self.frame_width)
        sy = float(image_height) / float(self.frame_height)
        self.vertices[:, 0] *= sx
        self.vertices[:, 1] *= sy
        self.frame_width = image_width
        self.frame_height = image_height

    def jsonize(self) -> dict:
        return {
            "vertices": self.vertices.tolist(),
            "vertices-score": self.v_confidences.tolist(),
            "edges": self.edges.tolist(),
            "edges-weights": self.weights.tolist(),
            "height": self.frame_height,
            "width": self.frame_width,
        }

    def save_json(self, fname) -> None:
        with open(fname, "w") as f:
            json.dump(self.jsonize(), f)

    def __repr__(self) -> str:
        return (
            f"WireframeGraph(V={self.num_vertices}, E={self.num_edges}, "
            f"HxW={self.frame_height}x{self.frame_width})"
        )
