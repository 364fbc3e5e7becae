"""External sources. Importing this package imports every submodule so
its declared queries register themselves (registry.py)."""

import importlib
import pkgutil

for _mod in pkgutil.iter_modules(__path__):
    importlib.import_module(f"{__name__}.{_mod.name}")
