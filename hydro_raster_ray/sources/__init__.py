from .tiles import TileSet, read_tiles, from_arrow_tiles, write_tiles, to_array  # noqa: F401
