from .pipeline import FramePipeline, PipelineConfig, FrameOutput
