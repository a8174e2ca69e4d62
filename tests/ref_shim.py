"""Back-compat alias: the reference-import shims moved into the package
(masklab_tpu/utils/ref_shim.py) so production code (utils/keras_export.py
--h5 export) no longer reaches into tests/. Test imports keep working."""
from masklab_tpu.utils.ref_shim import *  # noqa: F401,F403
from masklab_tpu.utils.ref_shim import install_shims, reference_modules  # noqa: F401
