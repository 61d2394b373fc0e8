"""ComfyUI plugin shim for the X2I TPU-native framework.

Install by dropping (or symlinking) this directory into
`ComfyUI/custom_nodes/`:

    ln -s /path/to/repo/comfyui_x2i_tpu ComfyUI/custom_nodes/comfyui_x2i_tpu

ComfyUI imports each custom-node package and reads
NODE_CLASS_MAPPINGS / NODE_DISPLAY_NAME_MAPPINGS
(reference registry: /root/reference/x2i_comfyui/nodes.py:164-180).
The node implementations live in x2i_tpu.integrations.comfyui; this shim
only makes the repo importable from inside a ComfyUI checkout where
x2i_tpu is not pip-installed.
"""

import os
import sys

_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

try:
    from x2i_tpu.integrations.comfyui import (  # noqa: F401
        NODE_CLASS_MAPPINGS, NODE_DISPLAY_NAME_MAPPINGS)
except ImportError:
    if _repo_root not in sys.path:
        sys.path.insert(0, _repo_root)
    from x2i_tpu.integrations.comfyui import (  # noqa: F401
        NODE_CLASS_MAPPINGS, NODE_DISPLAY_NAME_MAPPINGS)

__all__ = ["NODE_CLASS_MAPPINGS", "NODE_DISPLAY_NAME_MAPPINGS"]
