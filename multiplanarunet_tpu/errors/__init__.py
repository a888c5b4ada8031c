from multiplanarunet_tpu.errors.image_errors import (
    NoLabelFileError,
    ReadOnlyAttributeError,
)
from multiplanarunet_tpu.errors.implementation_change_errors import NotSparseError
