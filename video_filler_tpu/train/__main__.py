import sys

from video_filler_tpu.train.loop import main

main(sys.argv[1:])
