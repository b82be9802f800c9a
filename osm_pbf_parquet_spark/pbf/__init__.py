"""PBF physical-format layer: blob framing, protobuf wire decode, and the
vectorized PrimitiveBlock → Arrow parse kernel."""
