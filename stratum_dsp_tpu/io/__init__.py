from .decode import decode_file, decode_batch, MIX_AVERAGE, MIX_DOMINANT
