"""Import-path alias: the reference's second-backend base lived at
``magent.builtin.mx_model.base``; the implementation is the torch model."""

from ..torch_model.base import TorchBaseModel  # noqa: F401
