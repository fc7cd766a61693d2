"""The query catalog — assembler module.

Round-8 split: helpers live in ``catalog_base``, shared SQL fragments in
``catalog_shared``, and the registered entries (count pinned by
``tests/test_plan_quality.py::test_registry_full_order_is_frozen``, never
restated here) in six registration-order-
contiguous domain modules imported below.  @register runs at import time,
so THE IMPORT ORDER BELOW IS THE REGISTRATION ORDER and the registration
order is load-bearing: the driver grades exactly the first 50 registered
entries (``catalog_gate`` — tests/test_plan_quality.py pins the full
name list).  Never reorder these imports; append new entries at the end
of ``catalog_ann_curation``.

Numeric-parity and scale conventions are documented in ``catalog_base``.
"""

from __future__ import annotations

from .catalog_base import (  # noqa: F401
    Query,
    REGISTRY,
    dec,
    register,
    t,
)
from .catalog_shared import (  # noqa: F401
    CHUNK_SIZE,
    GAP_MINUTES,
    PACK_BUDGET,
    PACK_STREAMS,
)

# ORDER IS LOAD-BEARING — see module docstring.
from . import catalog_gate  # noqa: E402,F401
from . import catalog_embeddings_media  # noqa: E402,F401
from . import catalog_windows_sketches  # noqa: E402,F401
from . import catalog_training_prep  # noqa: E402,F401
from . import catalog_tpch_text  # noqa: E402,F401
from . import catalog_ann_curation  # noqa: E402,F401
