from plangen_tpu.tasks.processor import PlanGenProcessor
from plangen_tpu.tasks.pipeline import PlanGenPipeline

__all__ = ["PlanGenProcessor", "PlanGenPipeline"]
