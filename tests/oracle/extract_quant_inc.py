"""Extract the pure-math quant functions from the reference header into a
standalone include (under /tmp) so the oracle probe can compile them without
the stb dependency chain.  The reference tree itself is never modified."""
src = open('/root/reference/include/io_image.hpp').read()
start = src.index('inline void rgb_to_ycbcr')
end = src.index('// == [3]')
open('/tmp/io_image_quant_only.inc', 'w').write(src[start:end])
print("extracted", end - start, "bytes")
