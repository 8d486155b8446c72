"""Command-line tools (reference parity: src/t3dump.cpp, src/t3proto_tool.cpp,
src/main_bare.cpp).  Each module is runnable via
`python -m ternary_image_codec_tpu.cli.<tool>`."""
