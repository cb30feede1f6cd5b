"""Top-level Renderer: builds and drives the jit-compiled frame pipeline.

(Filled in as the frame pipeline lands; placeholder so the package imports.)
"""

from __future__ import annotations


class Renderer:  # pragma: no cover - replaced by the full implementation
    def __init__(self, *a, **kw):
        raise NotImplementedError("frame pipeline lands in the next milestone")
