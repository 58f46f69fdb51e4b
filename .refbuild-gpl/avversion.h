#define LIBAV_VERSION "13_dev0"
