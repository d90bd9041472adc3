from .base import BaseTask, EXPERIMENTS, get_task

__all__ = ["BaseTask", "EXPERIMENTS", "get_task"]
