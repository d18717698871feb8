from .api import (
    Instance,
    MetricSpec,
    Task,
    TaskConfig,
    THINK_POST_PROMPT,
    bootstrap_stderr,
    mean,
)
from .model_api import EngineModel, FromLogModel, LMM, StaticModel
from .runner import evaluate
from .tasks import get_task, list_tasks, register_task

__all__ = [
    "Instance", "MetricSpec", "Task", "TaskConfig", "THINK_POST_PROMPT",
    "bootstrap_stderr", "mean",
    "EngineModel", "FromLogModel", "LMM", "StaticModel",
    "evaluate",
    "get_task", "list_tasks", "register_task",
]
