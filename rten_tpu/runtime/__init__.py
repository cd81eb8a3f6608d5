from .executor import GraphExecutor, RunOptions
from .model import Model, ModelOptions

__all__ = ["GraphExecutor", "RunOptions", "Model", "ModelOptions"]
