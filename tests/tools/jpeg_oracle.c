/* Independent JPEG oracle for the vendored pure-Python codec:
 * drives the system libjpeg(-turbo), a separate implementation of
 * ITU-T T.81, so encoder/decoder agreement here is real
 * cross-validation, not self-consistency.
 *
 *   jpeg_oracle decode  < in.jpg  > out.raw   (w h c header line, then bytes)
 *   jpeg_oracle encode-arith W H C [quality] < in.raw > out.jpg
 *   jpeg_oracle encode-arith-prog W H C [quality] < in.raw > out.jpg
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static unsigned char *read_all(FILE *f, unsigned long *n) {
  size_t cap = 1 << 20, len = 0, r;
  unsigned char *buf = malloc(cap);
  while ((r = fread(buf + len, 1, cap - len, f)) > 0) {
    len += r;
    if (len == cap) { cap *= 2; buf = realloc(buf, cap); }
  }
  *n = len;
  return buf;
}

int main(int argc, char **argv) {
  unsigned long n;
  unsigned char *buf = read_all(stdin, &n);
  if (argc >= 2 && strcmp(argv[1], "decode") == 0) {
    struct jpeg_decompress_struct cinfo;
    struct jpeg_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, buf, n);
    jpeg_read_header(&cinfo, TRUE);
    jpeg_start_decompress(&cinfo);
    printf("%d %d %d\n", cinfo.output_width, cinfo.output_height,
           cinfo.output_components);
    fflush(stdout);
    int row = cinfo.output_width * cinfo.output_components;
    unsigned char *line = malloc(row);
    while (cinfo.output_scanline < cinfo.output_height) {
      JSAMPROW rp = line;
      jpeg_read_scanlines(&cinfo, &rp, 1);
      fwrite(line, 1, row, stdout);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  if (argc >= 5 && (strncmp(argv[1], "encode-arith", 12) == 0 ||
                    strncmp(argv[1], "encode-huff", 11) == 0)) {
    int w = atoi(argv[2]), h = atoi(argv[3]), c = atoi(argv[4]);
    int q = argc >= 6 ? atoi(argv[5]) : 100;
    int rst = argc >= 7 ? atoi(argv[6]) : 0;
    struct jpeg_compress_struct cinfo;
    struct jpeg_error_mgr jerr;
    unsigned char *out = NULL;
    unsigned long outn = 0;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_compress(&cinfo);
    jpeg_mem_dest(&cinfo, &out, &outn);
    cinfo.image_width = w;
    cinfo.image_height = h;
    cinfo.input_components = c;
    cinfo.in_color_space = c == 3 ? JCS_RGB : JCS_GRAYSCALE;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, q, TRUE);
    cinfo.arith_code = strncmp(argv[1], "encode-arith", 12) == 0;
    if (strcmp(argv[1], "encode-arith-prog") == 0 ||
        strcmp(argv[1], "encode-huff-prog") == 0)
      jpeg_simple_progression(&cinfo);
    if (rst) cinfo.restart_interval = rst;
    if (c == 3) {  /* keep chroma unsubsampled: the python scope */
      cinfo.comp_info[0].h_samp_factor = 1;
      cinfo.comp_info[0].v_samp_factor = 1;
    }
    jpeg_start_compress(&cinfo, TRUE);
    while (cinfo.next_scanline < cinfo.image_height) {
      JSAMPROW rp = buf + (size_t)cinfo.next_scanline * w * c;
      jpeg_write_scanlines(&cinfo, &rp, 1);
    }
    jpeg_finish_compress(&cinfo);
    jpeg_destroy_compress(&cinfo);
    fwrite(out, 1, outn, stdout);
    return 0;
  }
  fprintf(stderr, "usage: decode | encode-arith[-prog] W H C [q]\n");
  return 2;
}
