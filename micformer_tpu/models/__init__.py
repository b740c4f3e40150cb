"""Model zoo — every family from the reference's 10 subprojects, one registry.

Importing this package registers all factories (micformer_tpu.registry).
"""

from micformer_tpu.models import unet3d  # noqa: F401
from micformer_tpu.models import mednext  # noqa: F401
from micformer_tpu.models import micformer  # noqa: F401
from micformer_tpu.models import swinunet3d  # noqa: F401
from micformer_tpu.models import vtunet  # noqa: F401
from micformer_tpu.models import nnformer  # noqa: F401
from micformer_tpu.models import swinunetr  # noqa: F401
from micformer_tpu.models import transbts  # noqa: F401
from micformer_tpu.models import transunet  # noqa: F401
from micformer_tpu.models import generic_unet  # noqa: F401
