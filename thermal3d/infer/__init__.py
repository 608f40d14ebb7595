from thermal3d.infer.engine import InferenceEngine
from thermal3d.infer.export import ServingArtifact, save_serving_artifact
