"""Selection strategies: ITAL mutual-information batch selection and baselines."""

from ital_tpu.select.base import STRATEGIES, get_strategy, register  # noqa: F401

# Import for registration side effects.
from ital_tpu.select import ital as _ital  # noqa: F401,E402
from ital_tpu.select import baselines as _baselines  # noqa: F401,E402
from ital_tpu.select import regression as _regression  # noqa: F401,E402
