"""Operator surface (SURVEY.md §2). Importing this package registers
every query into the registry (side-effect registration keeps the
registry definition and the operator implementation in one place)."""

from . import asof  # noqa: F401
from . import dedup  # noqa: F401
from . import graph  # noqa: F401
from . import nullcol  # noqa: F401
from . import pipelines  # noqa: F401
from . import product_analytics  # noqa: F401
from . import quality  # noqa: F401
from . import relational  # noqa: F401
from . import sampling  # noqa: F401
from . import scalar  # noqa: F401
from . import scd  # noqa: F401
from . import sectionizer  # noqa: F401
from . import similarity  # noqa: F401
from . import textops  # noqa: F401
from . import timeseries  # noqa: F401
from . import tpch  # noqa: F401
from . import unigram  # noqa: F401
from . import windows  # noqa: F401
from ..sources import layout  # noqa: F401
from ..sources import multimodal  # noqa: F401
