// iio_lite: native image I/O for mgm_tpu.
//
// A from-scratch, minimal replacement for the behavioural surface the
// reference stereo pipeline actually uses from its 6.2 kLoC iio library
// (gfacciol/mgm iio/iio.c): read PNG/JPEG/TIFF/PNM/PFM into planar
// ("split") float32, write float TIFF / PFM / 8-bit PNG chosen by file
// extension (iio.c:5154 read, iio.c:5340 split API, iio.c:5732 write).
// Format is detected by magic number on read, like iio's guess_format
// (iio.c:4743), not by extension.
//
// Exposed as a C ABI for the Python ctypes binding in mgm_tpu/io.py.
//
// Memory model: read fills a malloc'd buffer returned to the caller;
// the caller must release it with iio_lite_free.

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <jpeglib.h>
#include <png.h>
#include <tiffio.h>

extern "C" {

// ---------------------------------------------------------------- util

static void interleaved_to_split(const float *in, float *out, int w, int h,
                                 int c) {
  // (h, w, c) interleaved -> c planes of (h, w)
  for (int y = 0; y < h; y++)
    for (int x = 0; x < w; x++)
      for (int k = 0; k < c; k++)
        out[(size_t)k * w * h + (size_t)y * w + x] =
            in[((size_t)y * w + x) * c + k];
}

// ----------------------------------------------------------------- png

static int read_png(FILE *f, float **out, int *w, int *h, int *c) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return -1;
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -1;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_uint_32 W, H;
  int depth, color;
  png_get_IHDR(png, info, &W, &H, &depth, &color, nullptr, nullptr, nullptr);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_read_update_info(png, info);
  int C = png_get_channels(png, info);
  depth = png_get_bit_depth(png, info);
  size_t rowbytes = png_get_rowbytes(png, info);
  uint8_t *rows = (uint8_t *)malloc(rowbytes * H);
  png_bytep *rp = (png_bytep *)malloc(sizeof(png_bytep) * H);
  for (png_uint_32 y = 0; y < H; y++) rp[y] = rows + y * rowbytes;
  png_read_image(png, rp);
  png_destroy_read_struct(&png, &info, nullptr);

  float *buf = (float *)malloc(sizeof(float) * W * H * C);
  if (depth == 16) {
    for (size_t i = 0; i < (size_t)W * H * C; i++)
      buf[i] = (float)((rows[2 * i] << 8) | rows[2 * i + 1]);  // PNG is BE
  } else {
    for (size_t i = 0; i < (size_t)W * H * C; i++) buf[i] = (float)rows[i];
  }
  free(rp);
  free(rows);
  *out = (float *)malloc(sizeof(float) * W * H * C);
  interleaved_to_split(buf, *out, W, H, C);
  free(buf);
  *w = W;
  *h = H;
  *c = C;
  return 0;
}

static int write_png(const char *path, const float *split, int w, int h,
                     int c) {
  if (c != 1 && c != 3 && c != 2 && c != 4) return -1;
  FILE *f = fopen(path, "wb");
  if (!f) return -1;
  png_structp png =
      png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_write_struct(&png, &info);
    fclose(f);
    return -1;
  }
  png_init_io(png, f);
  static const int ct[5] = {0, PNG_COLOR_TYPE_GRAY, PNG_COLOR_TYPE_GRAY_ALPHA,
                            PNG_COLOR_TYPE_RGB, PNG_COLOR_TYPE_RGB_ALPHA};
  png_set_IHDR(png, info, w, h, 8, ct[c], PNG_INTERLACE_NONE,
               PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);
  uint8_t *row = (uint8_t *)malloc((size_t)w * c);
  for (int y = 0; y < h; y++) {
    for (int x = 0; x < w; x++)
      for (int k = 0; k < c; k++) {
        float v = split[(size_t)k * w * h + (size_t)y * w + x];
        // clip-to-[0,255] cast, iio's behaviour for 8-bit outputs
        if (!(v > 0)) v = 0;
        if (v > 255) v = 255;
        row[x * c + k] = (uint8_t)v;
      }
    png_write_row(png, row);
  }
  free(row);
  png_write_end(png, info);
  png_destroy_write_struct(&png, &info);
  fclose(f);
  return 0;
}

// ---------------------------------------------------------------- jpeg

static int read_jpeg(FILE *f, float **out, int *w, int *h, int *c) {
  struct jpeg_decompress_struct cinfo;
  struct jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  jpeg_start_decompress(&cinfo);
  int W = cinfo.output_width, H = cinfo.output_height,
      C = cinfo.output_components;
  float *buf = (float *)malloc(sizeof(float) * W * H * C);
  uint8_t *row = (uint8_t *)malloc((size_t)W * C);
  for (int y = 0; y < H; y++) {
    jpeg_read_scanlines(&cinfo, &row, 1);
    for (int i = 0; i < W * C; i++) buf[(size_t)y * W * C + i] = (float)row[i];
  }
  free(row);
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *out = (float *)malloc(sizeof(float) * W * H * C);
  interleaved_to_split(buf, *out, W, H, C);
  free(buf);
  *w = W;
  *h = H;
  *c = C;
  return 0;
}

// ---------------------------------------------------------------- tiff

static int read_tiff(const char *path, float **out, int *w, int *h, int *c) {
  TIFF *tif = TIFFOpen(path, "r");
  if (!tif) return -1;
  uint32_t W, H;
  uint16_t C = 1, depth = 8, fmt = SAMPLEFORMAT_UINT, planar = PLANARCONFIG_CONTIG;
  TIFFGetField(tif, TIFFTAG_IMAGEWIDTH, &W);
  TIFFGetField(tif, TIFFTAG_IMAGELENGTH, &H);
  TIFFGetFieldDefaulted(tif, TIFFTAG_SAMPLESPERPIXEL, &C);
  TIFFGetFieldDefaulted(tif, TIFFTAG_BITSPERSAMPLE, &depth);
  TIFFGetFieldDefaulted(tif, TIFFTAG_SAMPLEFORMAT, &fmt);
  TIFFGetFieldDefaulted(tif, TIFFTAG_PLANARCONFIG, &planar);

  float *buf = (float *)malloc(sizeof(float) * W * H * C);
  tsize_t sl = TIFFScanlineSize(tif);
  uint8_t *row = (uint8_t *)_TIFFmalloc(sl);
  int spp = (planar == PLANARCONFIG_CONTIG) ? C : 1;
  int nplanes = (planar == PLANARCONFIG_CONTIG) ? 1 : C;
  for (int p = 0; p < nplanes; p++)
    for (uint32_t y = 0; y < H; y++) {
      if (TIFFReadScanline(tif, row, y, p) < 0) {
        _TIFFfree(row);
        TIFFClose(tif);
        free(buf);
        return -1;
      }
      for (uint32_t x = 0; x < W; x++)
        for (int k = 0; k < spp; k++) {
          int ch = (planar == PLANARCONFIG_CONTIG) ? k : p;
          float v;
          const uint8_t *px = row + ((size_t)x * spp + k) * (depth / 8);
          if (fmt == SAMPLEFORMAT_IEEEFP && depth == 32)
            memcpy(&v, px, 4);
          else if (fmt == SAMPLEFORMAT_IEEEFP && depth == 64) {
            double d;
            memcpy(&d, px, 8);
            v = (float)d;
          } else if (depth == 8)
            v = (fmt == SAMPLEFORMAT_INT) ? (float)*(int8_t *)px : (float)*px;
          else if (depth == 16)
            v = (fmt == SAMPLEFORMAT_INT) ? (float)*(int16_t *)px
                                          : (float)*(uint16_t *)px;
          else if (depth == 32)
            v = (fmt == SAMPLEFORMAT_INT) ? (float)*(int32_t *)px
                                          : (float)*(uint32_t *)px;
          else {
            _TIFFfree(row);
            TIFFClose(tif);
            free(buf);
            return -1;
          }
          buf[((size_t)y * W + x) * C + ch] = v;
        }
    }
  _TIFFfree(row);
  TIFFClose(tif);
  *out = (float *)malloc(sizeof(float) * W * H * C);
  interleaved_to_split(buf, *out, W, H, C);
  free(buf);
  *w = W;
  *h = H;
  *c = C;
  return 0;
}

static int write_tiff(const char *path, const float *split, int w, int h,
                      int c) {
  TIFF *tif = TIFFOpen(path, "w");
  if (!tif) return -1;
  TIFFSetField(tif, TIFFTAG_IMAGEWIDTH, (uint32_t)w);
  TIFFSetField(tif, TIFFTAG_IMAGELENGTH, (uint32_t)h);
  TIFFSetField(tif, TIFFTAG_SAMPLESPERPIXEL, (uint16_t)c);
  TIFFSetField(tif, TIFFTAG_BITSPERSAMPLE, (uint16_t)32);
  TIFFSetField(tif, TIFFTAG_SAMPLEFORMAT, SAMPLEFORMAT_IEEEFP);
  TIFFSetField(tif, TIFFTAG_PLANARCONFIG, PLANARCONFIG_CONTIG);
  TIFFSetField(tif, TIFFTAG_PHOTOMETRIC,
               c >= 3 ? PHOTOMETRIC_RGB : PHOTOMETRIC_MINISBLACK);
  TIFFSetField(tif, TIFFTAG_COMPRESSION, COMPRESSION_NONE);
  TIFFSetField(tif, TIFFTAG_ROWSPERSTRIP, (uint32_t)1);
  float *row = (float *)malloc(sizeof(float) * w * c);
  for (int y = 0; y < h; y++) {
    for (int x = 0; x < w; x++)
      for (int k = 0; k < c; k++)
        row[x * c + k] = split[(size_t)k * w * h + (size_t)y * w + x];
    if (TIFFWriteScanline(tif, row, y, 0) < 0) {
      free(row);
      TIFFClose(tif);
      return -1;
    }
  }
  free(row);
  TIFFClose(tif);
  return 0;
}

// ------------------------------------------------------------- pnm/pfm

static void skip_ws_comments(FILE *f) {
  int ch;
  while ((ch = fgetc(f)) != EOF) {
    if (ch == '#') {
      while ((ch = fgetc(f)) != EOF && ch != '\n') {
      }
    } else if (!isspace(ch)) {
      ungetc(ch, f);
      return;
    }
  }
}

static int read_pnm(FILE *f, float **out, int *w, int *h, int *c) {
  int p = fgetc(f), n = fgetc(f);
  if (p != 'P') return -1;
  int C = (n == '6' || n == '3') ? 3 : 1;
  int ascii = (n == '2' || n == '3');
  skip_ws_comments(f);
  int W, H, maxv;
  if (fscanf(f, "%d", &W) != 1) return -1;
  skip_ws_comments(f);
  if (fscanf(f, "%d", &H) != 1) return -1;
  skip_ws_comments(f);
  if (fscanf(f, "%d", &maxv) != 1) return -1;
  fgetc(f);  // single whitespace
  size_t n_samples = (size_t)W * H * C;
  float *buf = (float *)malloc(sizeof(float) * n_samples);
  if (ascii) {
    for (size_t i = 0; i < n_samples; i++) {
      int v;
      if (fscanf(f, "%d", &v) != 1) {
        free(buf);
        return -1;
      }
      buf[i] = (float)v;
    }
  } else if (maxv < 256) {
    uint8_t *raw = (uint8_t *)malloc(n_samples);
    if (fread(raw, 1, n_samples, f) != n_samples) {
      free(raw);
      free(buf);
      return -1;
    }
    for (size_t i = 0; i < n_samples; i++) buf[i] = (float)raw[i];
    free(raw);
  } else {
    uint8_t *raw = (uint8_t *)malloc(2 * n_samples);
    if (fread(raw, 1, 2 * n_samples, f) != 2 * n_samples) {
      free(raw);
      free(buf);
      return -1;
    }
    for (size_t i = 0; i < n_samples; i++)
      buf[i] = (float)((raw[2 * i] << 8) | raw[2 * i + 1]);
    free(raw);
  }
  *out = (float *)malloc(sizeof(float) * n_samples);
  interleaved_to_split(buf, *out, W, H, C);
  free(buf);
  *w = W;
  *h = H;
  *c = C;
  return 0;
}

static int read_pfm(FILE *f, float **out, int *w, int *h, int *c) {
  int p = fgetc(f), n = fgetc(f);
  if (p != 'P' || (n != 'F' && n != 'f')) return -1;
  int C = (n == 'F') ? 3 : 1;
  int W, H;
  float scale;
  if (fscanf(f, "%d %d %f", &W, &H, &scale) != 3) return -1;
  fgetc(f);
  size_t n_samples = (size_t)W * H * C;
  float *buf = (float *)malloc(sizeof(float) * n_samples);
  if (fread(buf, 4, n_samples, f) != n_samples) {
    free(buf);
    return -1;
  }
  int swap = (scale < 0) != (*(const uint16_t *)"\x01\x00" == 1);
  // PFM is little-endian when scale < 0; host assumed LE here, so only
  // byte-swap for positive (big-endian) scales
  if (scale > 0) {
    for (size_t i = 0; i < n_samples; i++) {
      uint32_t v;
      memcpy(&v, buf + i, 4);
      v = __builtin_bswap32(v);
      memcpy(buf + i, &v, 4);
    }
  }
  (void)swap;
  // PFM scanlines are bottom-to-top
  float *flipped = (float *)malloc(sizeof(float) * n_samples);
  for (int y = 0; y < H; y++)
    memcpy(flipped + (size_t)y * W * C, buf + (size_t)(H - 1 - y) * W * C,
           sizeof(float) * W * C);
  free(buf);
  *out = (float *)malloc(sizeof(float) * n_samples);
  interleaved_to_split(flipped, *out, W, H, C);
  free(flipped);
  *w = W;
  *h = H;
  *c = C;
  return 0;
}

static int write_pfm(const char *path, const float *split, int w, int h,
                     int c) {
  if (c != 1 && c != 3) return -1;
  FILE *f = fopen(path, "wb");
  if (!f) return -1;
  fprintf(f, "P%c\n%d %d\n-1.0\n", c == 3 ? 'F' : 'f', w, h);
  float *row = (float *)malloc(sizeof(float) * w * c);
  for (int y = h - 1; y >= 0; y--) {
    for (int x = 0; x < w; x++)
      for (int k = 0; k < c; k++)
        row[x * c + k] = split[(size_t)k * w * h + (size_t)y * w + x];
    fwrite(row, 4, (size_t)w * c, f);
  }
  free(row);
  fclose(f);
  return 0;
}

// ------------------------------------------------------------ dispatch

int iio_lite_read(const char *path, float **out, int *w, int *h, int *c) {
  FILE *f = fopen(path, "rb");
  if (!f) return -1;
  uint8_t magic[4] = {0};
  size_t got = fread(magic, 1, 4, f);
  rewind(f);
  int rc = -1;
  if (got >= 2 && magic[0] == 0x89 && magic[1] == 'P') {
    rc = read_png(f, out, w, h, c);
  } else if (got >= 2 && magic[0] == 0xff && magic[1] == 0xd8) {
    rc = read_jpeg(f, out, w, h, c);
  } else if (got >= 2 && ((magic[0] == 'I' && magic[1] == 'I') ||
                          (magic[0] == 'M' && magic[1] == 'M'))) {
    fclose(f);
    return read_tiff(path, out, w, h, c);
  } else if (got >= 2 && magic[0] == 'P' && magic[1] >= '1' && magic[1] <= '6') {
    rc = read_pnm(f, out, w, h, c);
  } else if (got >= 2 && magic[0] == 'P' && (magic[1] == 'F' || magic[1] == 'f')) {
    rc = read_pfm(f, out, w, h, c);
  }
  fclose(f);
  return rc;
}

int iio_lite_write(const char *path, const float *split, int w, int h, int c) {
  const char *dot = strrchr(path, '.');
  const char *ext = dot ? dot + 1 : "";
  if (!strcasecmp(ext, "tif") || !strcasecmp(ext, "tiff"))
    return write_tiff(path, split, w, h, c);
  if (!strcasecmp(ext, "pfm")) return write_pfm(path, split, w, h, c);
  if (!strcasecmp(ext, "png")) return write_png(path, split, w, h, c);
  return -1;
}

void iio_lite_free(float *p) { free(p); }

}  // extern "C"
