"""Golden scene constructors mirroring each reference Renderer/Layer ctor."""
