from .numeric import dsum, davg  # noqa: F401
from .enums import (  # noqa: F401
    IDENTIFIER_TYPES,
    REACTION_ROLES,
    MASS_UNITS,
    MOLES_UNITS,
    VOLUME_UNITS,
    decode_enum,
)
from .vector_math import cosine_similarity, dot, l2_norm  # noqa: F401
