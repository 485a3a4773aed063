from nersemble_tpu.viewer.server import ViewerServer, encode_image, orbit_pose

__all__ = ["ViewerServer", "encode_image", "orbit_pose"]
