import javax.imageio.ImageIO;
import java.awt.image.*;
import java.io.*;

public class GenGif {
  static long state = 31337;
  static int next(int mod) {
    state = state * 6364136223846793005L + 1442695040888963407L;
    return (int) Math.floorMod(state >>> 33, mod);
  }
  public static void main(String[] args) throws Exception {
    int w = 29, h = 21;
    byte[] r = new byte[16], g = new byte[16], b = new byte[16];
    for (int i = 0; i < 16; i++) {
      r[i] = (byte) next(256); g[i] = (byte) next(256); b[i] = (byte) next(256);
    }
    IndexColorModel cm = new IndexColorModel(4, 16, r, g, b);
    BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, cm);
    StringBuilder sb = new StringBuilder();
    for (int y = 0; y < h; y++)
      for (int x = 0; x < w; x++) {
        int i = next(16);
        int rgb = ((r[i]&255)<<16)|((g[i]&255)<<8)|(b[i]&255);
        img.setRGB(x, y, 0xFF000000 | rgb);
        sb.append((r[i]&255)+","+(g[i]&255)+","+(b[i]&255));
        sb.append(x==w-1?"\n":";");
      }
    ImageIO.write(img, "gif", new File("jdk_indexed.gif"));
    try (PrintWriter pw = new PrintWriter("jdk_indexed_gif_rgb.txt")) { pw.print(sb); }
    System.out.println("done");
  }
}
