"""Sources: envelope synthesis (test mode), protobuf decode, streaming
file/kinesis sources."""
