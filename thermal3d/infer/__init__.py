from thermal3d.infer.engine import InferenceEngine
