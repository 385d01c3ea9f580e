"""HTTP serving front end for the continuous-batching engine."""

from tpu_flash.serve.server import ByteTokenizer, EngineServer, serve

__all__ = ["ByteTokenizer", "EngineServer", "serve"]
