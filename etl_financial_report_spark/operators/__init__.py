"""Operator surface (SURVEY.md §2). Importing this package registers
every query into the registry (side-effect registration keeps the
registry definition and the operator implementation in one place)."""

from . import relational  # noqa: F401
from . import scalar  # noqa: F401
from . import windows  # noqa: F401
