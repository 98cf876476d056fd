from .stream import validated_stream_writer  # noqa: F401
