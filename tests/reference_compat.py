"""Import the reference torch modules from /root/reference for parity tests.

The reference depends on pytorch_lightning (not installed here) only for its
training wrapper classes; we stub just enough of it that the module imports.
Nothing from the reference is copied — modules are loaded read-only from
their original location purely to produce golden outputs.
"""

from __future__ import annotations

import importlib.util
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _install_lightning_stub():
    if "pytorch_lightning" in sys.modules:
        return
    import torch.nn as nn

    pl = types.ModuleType("pytorch_lightning")
    pl.LightningModule = nn.Module
    utilities = types.ModuleType("pytorch_lightning.utilities")
    utilities.rank_zero_info = lambda *a, **k: None
    pl.utilities = utilities
    callbacks = types.ModuleType("pytorch_lightning.callbacks")
    callbacks.ModelCheckpoint = object
    pl.callbacks = callbacks
    pl.Trainer = object
    sys.modules["pytorch_lightning"] = pl
    sys.modules["pytorch_lightning.utilities"] = utilities
    sys.modules["pytorch_lightning.callbacks"] = callbacks


def load_reference_module(package: str, module: str):
    """Load e.g. ('structure_model', 'model') as an isolated module object.

    Handles the reference's flat `from utils import ...` imports by loading
    the sibling utils first under the plain name 'utils', scoped per call.
    """
    _install_lightning_stub()
    pkg_dir = f"{REFERENCE_ROOT}/{package}"

    saved = {k: sys.modules.pop(k) for k in ("utils", "model", "dataset")
             if k in sys.modules}
    sys.path.insert(0, pkg_dir)
    try:
        spec = importlib.util.spec_from_file_location("utils", f"{pkg_dir}/utils.py")
        utils_mod = importlib.util.module_from_spec(spec)
        sys.modules["utils"] = utils_mod
        spec.loader.exec_module(utils_mod)

        spec = importlib.util.spec_from_file_location(
            f"ref_{package}_{module}", f"{pkg_dir}/{module}.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path.remove(pkg_dir)
        for k in ("utils", "model", "dataset"):
            sys.modules.pop(k, None)
        sys.modules.update(saved)
