import javax.imageio.*;
import javax.imageio.stream.*;
import java.awt.image.*;
import java.io.*;
import java.util.Iterator;

public class GenPng {
  // deterministic LCG so Python can reproduce the source pixels exactly
  static long state = 12345;
  static int next(int mod) {
    state = state * 6364136223846793005L + 1442695040888963407L;
    return (int) Math.floorMod(state >>> 33, mod);
  }

  public static void main(String[] args) throws Exception {
    int w = 37, h = 29;
    // ---- palette image: 16-color indexed ----
    byte[] r = new byte[16], g = new byte[16], b = new byte[16];
    for (int i = 0; i < 16; i++) {
      r[i] = (byte) next(256); g[i] = (byte) next(256); b[i] = (byte) next(256);
    }
    IndexColorModel cm = new IndexColorModel(4, 16, r, g, b);
    BufferedImage pal = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, cm);
    int[][] idx = new int[h][w];
    StringBuilder sbIdx = new StringBuilder();
    StringBuilder sbPal = new StringBuilder();
    for (int i = 0; i < 16; i++)
      sbPal.append((r[i]&255)+","+(g[i]&255)+","+(b[i]&255)+"\n");
    for (int y = 0; y < h; y++) {
      for (int x = 0; x < w; x++) {
        idx[y][x] = next(16);
        int rgb = ((r[idx[y][x]]&255)<<16)|((g[idx[y][x]]&255)<<8)|(b[idx[y][x]]&255);
        pal.setRGB(x, y, 0xFF000000 | rgb);
        sbIdx.append(idx[y][x]); sbIdx.append(x==w-1?"\n":",");
      }
    }
    ImageIO.write(pal, "png", new File("jdk_palette.png"));
    try (PrintWriter pw = new PrintWriter("jdk_palette_idx.txt")) { pw.print(sbIdx); }
    try (PrintWriter pw = new PrintWriter("jdk_palette_plte.txt")) { pw.print(sbPal); }

    // ---- interlaced (Adam7) RGB image ----
    BufferedImage rgbImg = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR);
    StringBuilder sbRgb = new StringBuilder();
    for (int y = 0; y < h; y++) {
      for (int x = 0; x < w; x++) {
        int rr = next(256), gg = next(256), bb = next(256);
        rgbImg.setRGB(x, y, (rr<<16)|(gg<<8)|bb);
        sbRgb.append(rr+","+gg+","+bb); sbRgb.append(x==w-1?"\n":";");
      }
    }
    Iterator<ImageWriter> it = ImageIO.getImageWritersByFormatName("png");
    ImageWriter wr = it.next();
    ImageWriteParam p = wr.getDefaultWriteParam();
    p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT); // Adam7
    try (ImageOutputStream os = ImageIO.createImageOutputStream(new File("jdk_interlaced.png"))) {
      wr.setOutput(os);
      wr.write(null, new IIOImage(rgbImg, null, null), p);
    }
    wr.dispose();
    try (PrintWriter pw = new PrintWriter("jdk_interlaced_rgb.txt")) { pw.print(sbRgb); }
    System.out.println("done");
  }
}
