from . import arcface, mapper, mobilenet, perceptual, resnet, deeplab

__all__ = ["arcface", "mapper", "mobilenet", "perceptual", "resnet",
           "deeplab"]
