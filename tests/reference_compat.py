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


def _install_biotite_stub():
    """create_pdb.py imports biotite at module level but the NERF classes
    under test never touch it; stub the two imported names."""
    if "biotite" in sys.modules:
        return
    biotite = types.ModuleType("biotite")
    structure = types.ModuleType("biotite.structure")
    io = types.ModuleType("biotite.structure.io")
    pdb = types.ModuleType("biotite.structure.io.pdb")
    pdb.PDBFile = object
    structure.io = io
    io.pdb = pdb
    biotite.structure = structure
    sys.modules["biotite"] = biotite
    sys.modules["biotite.structure"] = structure
    sys.modules["biotite.structure.io"] = io
    sys.modules["biotite.structure.io.pdb"] = pdb


def load_reference_module(package: str, module: str, preload=("utils",)):
    """Load e.g. ('structure_model', 'model') as an isolated module object.

    Handles the reference's flat `from utils import ...` imports by loading
    the named sibling modules first under their plain names, scoped per call.
    """
    _install_lightning_stub()
    _install_biotite_stub()
    pkg_dir = f"{REFERENCE_ROOT}/{package}"

    plain_names = ("utils", "model", "dataset")
    saved = {k: sys.modules.pop(k) for k in plain_names if k in sys.modules}
    sys.path.insert(0, pkg_dir)
    try:
        for name in preload:
            spec = importlib.util.spec_from_file_location(
                name, f"{pkg_dir}/{name}.py")
            pre_mod = importlib.util.module_from_spec(spec)
            sys.modules[name] = pre_mod
            spec.loader.exec_module(pre_mod)

        spec = importlib.util.spec_from_file_location(
            f"ref_{package}_{module}", f"{pkg_dir}/{module}.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path.remove(pkg_dir)
        for k in plain_names:
            sys.modules.pop(k, None)
        sys.modules.update(saved)
