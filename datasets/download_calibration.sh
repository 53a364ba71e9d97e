#!/bin/bash
# Fetch the int8 calibration sets used by quant/calibrate.py
# (counterpart of the reference datasets/download_image.sh / download_video.sh;
# the reference pulls from a BCE bucket with an expiring signed URL — point
# CALIB_IMAGE_URL / CALIB_VIDEO_URL at your own mirror).
set -e
: "${CALIB_IMAGE_URL:?set CALIB_IMAGE_URL to an image.zip calibration-set mirror}"
wget -O image.zip "$CALIB_IMAGE_URL"
unzip -o image.zip -d calibration_images
if [ -n "$CALIB_VIDEO_URL" ]; then
  wget -O video.zip "$CALIB_VIDEO_URL"
  unzip -o video.zip -d calibration_videos
fi
