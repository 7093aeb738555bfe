from recnext_tpu.models.recnext import RecNext, RecNextConfig  # noqa: F401
from recnext_tpu.models.registry import create_model, get_config, list_models  # noqa: F401
from recnext_tpu.models.mlla import MLLA, MLLA_CONFIGS, MLLAConfig, create_mlla  # noqa: F401
